package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-event validation + dead-letter split (O-15 / O-32; reference
  * `docs/design.md:640-641`, `:873-876`, dead-letter `docs/system-design.md:373`).
  *
  * Structural checks are required-field null checks against the domain
  * envelope contract (the JSON-Schema `required` list, docs/design.md:944-971);
  * business checks are pluggable column predicates. Invalid events are
  * diverted with a reason column instead of failing the stream.
  */
object Validate {

  /** Contract: every domain event must carry these non-null fields. */
  val structural: Column =
    col("eventId").isNotNull &&
      col("eventType").isNotNull &&
      col("eventCategory").isNotNull &&
      col("timestamp").isNotNull &&
      col("aggregateId").isNotNull &&
      col("aggregateType").isNotNull &&
      col("version").isNotNull &&
      col("payload").isNotNull &&
      // payload must be parseable JSON (schema round-trip check)
      try_parse_json(col("payload")).isNotNull

  /** Business rules, keyed by a reason label (extensible). */
  val business: Seq[(String, Column)] = Seq(
    "unknown_event_type" ->
      col("eventType").isin(Rules.subjects.keys.toSeq: _*),
    "negative_salary" ->
      (col("eventType") =!= "EmployeePromoted" ||
        get_json_object(col("payload"), "$.newSalary").cast("double") >= 0))

  final case class Split(valid: DataFrame, deadLetter: DataFrame)

  /** Split a domain-event stream into valid / dead-letter branches. The
    * dead-letter branch carries the first failing reason.
    */
  def split(events: DataFrame, extra: Seq[(String, Column)] = Nil): Split = {
    val checks = ("structural" -> structural) +: (business ++ extra)
    val reason = checks.foldRight(lit(null).cast("string")) {
      case ((label, pred), rest) => when(!coalesce(pred, lit(false)), label).otherwise(rest)
    }
    val tagged = events.withColumn("_invalid_reason", reason)
    Split(
      valid = tagged.filter(col("_invalid_reason").isNull).drop("_invalid_reason"),
      deadLetter = tagged.filter(col("_invalid_reason").isNotNull)
        .withColumnRenamed("_invalid_reason", "reason"))
  }

  /** Sequence-continuity audit: per partition key, report every hole in
    * a sequence column that the upstream contract says is contiguous —
    * the binlog-integrity monitor ("did we lose offsets between
    * position N and M?" — the reference's at-least-once delivery and
    * consumer-lag concern, docs/design.md:589-595). Emits
    * `(…partition…, gap_after, gap_before, missing)` per hole, where
    * `missing = gap_before − gap_after − 1 > 0`.
    *
    * One shuffle on the partition key (per-key lag window, never
    * global); output is bounded by the number of HOLES, not rows — on a
    * healthy 100 TB log it is empty.
    */
  def sequenceGaps(df: DataFrame, partitionCols: Seq[String],
                   seqCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*).orderBy(col("_s"))
    df.select(partitionCols.map(col) :+ col(seqCol).as("_s"): _*)
      .withColumn("_prev", lag(col("_s"), 1).over(w))
      .filter(col("_prev").isNotNull && col("_s") > col("_prev") + 1L)
      .select(partitionCols.map(col) :+ col("_prev").as("gap_after") :+
        col("_s").as("gap_before") :+
        (col("_s") - col("_prev") - 1L).as("missing"): _*)
  }
}
