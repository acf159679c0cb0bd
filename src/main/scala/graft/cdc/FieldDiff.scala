package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Field-level diff generator (O-31) — the audit-trail operator
  * (reference `docs/design.md:185-197`): explodes an update envelope into one
  * row per changed field with (old_value, new_value) as strings.
  *
  * Schema-generic: the field list is read from the envelope's `before` struct
  * at plan time, so the generated plan is a single codegen'd
  * explode(array(struct...)) + filter — no UDTF, no reflection at runtime.
  */
object FieldDiff {

  /** envelope(before, after, source, op, ts_ms) ->
    * (entity_type, entity_id, operation, changed_at, field_name, old_value,
    *  new_value, event_id)
    */
  def audit(envelopes: DataFrame, idField: String = "id"): DataFrame = {
    val rowSchema = envelopes.schema("before").dataType.asInstanceOf[StructType]
    val diffs = array(rowSchema.fieldNames.toIndexedSeq.map { f =>
      struct(
        lit(f).as("field_name"),
        col(s"before.$f").cast("string").as("old_value"),
        col(s"after.$f").cast("string").as("new_value"))
    }: _*)

    envelopes
      .select(
        col("source.table").as("entity_type"),
        coalesce(col(s"after.$idField"), col(s"before.$idField"))
          .cast("string").as("entity_id"),
        // Debezium op -> audit operation name
        when(col("op") === "c", "INSERT")
          .when(col("op") === "u", "UPDATE")
          .when(col("op") === "d", "DELETE")
          .otherwise("SNAPSHOT").as("operation"),
        timestamp_millis(col("ts_ms")).as("changed_at"),
        explode(diffs).as("diff"),
        md5(concat_ws("|", col("source.table"), col("op"),
          coalesce(col(s"after.$idField"), col(s"before.$idField")).cast("string"),
          col("ts_ms"))).as("event_id"))
      .filter(!(col("diff.old_value") <=> col("diff.new_value")))
      .select(
        col("entity_type"), col("entity_id"), col("operation"),
        col("changed_at"), col("diff.field_name").as("field_name"),
        col("diff.old_value").as("old_value"),
        col("diff.new_value").as("new_value"), col("event_id"))
  }
}
