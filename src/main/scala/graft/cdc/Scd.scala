package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension materialization from a change stream — the
  * state-reconstruction layer the reference's event store implies
  * (`docs/design.md:163-198` persists every change; consumers then need
  * "what did the row look like at time T", which neither the raw stream
  * nor the latest-state snapshot answers). Two derived shapes:
  *
  *  - `history` (SCD Type 2): one row per VERSION, carrying
  *    `valid_from` = the change's timestamp, `valid_to` = the next
  *    change's timestamp for the same key (NULL while current), and
  *    `is_current`. A delete closes its predecessor's interval without
  *    opening one (the deleted version row is dropped; its closing
  *    effect survives via lead() BEFORE the filter).
  *  - `asOf`: the point-in-time snapshot — each key's version whose
  *    interval covers T (half-open [from, to): a version is visible AT
  *    its own change instant, replaced exactly at its successor's).
  *
  * Scale: one shuffle on the key columns, then a narrow per-key lead();
  * no self-join, no driver state. At 100 TB the history write
  * partitions/buckets by key (`Bucketing`) so `asOf` and key lookups
  * prune; the window never materializes more than a key's versions per
  * task. Ties at one timestamp are ordered by `tieCol` (the stream's
  * total order within a key — event id / binlog position), which makes
  * both outputs deterministic.
  */
object Scd {

  /** SCD Type-2 history. `changes` must carry the key, timestamp, op
    * ('c'/'u'/'d') and payload columns; every input column is preserved
    * on the version rows, plus (valid_from, valid_to, is_current).
    */
  def history(changes: DataFrame, keyCols: Seq[String], tsCol: String,
              tieCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "history needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      // a delete's own row is not a version — but it has already closed
      // its predecessor via lead() above
      .filter(col(opCol) =!= "d")
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time snapshot over a `history` frame: versions whose
    * half-open [valid_from, valid_to) interval covers `t`.
    */
  def asOf(history: DataFrame, t: Column): DataFrame =
    history.filter(col("valid_from") <= t &&
      (col("valid_to").isNull || col("valid_to") > t))

  /** CURRENT state materialized straight from a change stream — the
    * MERGE INTO / latest-wins upsert shape (each key's last change wins;
    * a key whose last change is a delete is absent). This is `history`
    * restricted to `is_current`, but expressed as a max_by aggregation
    * instead of a window: one shuffle, and the per-group state is ONE
    * row (the current winner), not the key's version list — the right
    * plan when history is not wanted.
    */
  def latest(changes: DataFrame, keyCols: Seq[String], tsCol: String,
             tieCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "latest needs at least one key column")
    val payload = struct(changes.columns.map(col): _*)
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, struct(col(tsCol), col(tieCol))).as("_winner"))
      .select(col("_winner.*"))
      .filter(col(opCol) =!= "d")
  }

  /** Snapshot DIFF between two points in time, derived from ONE history
    * pass: which keys were added, removed, or changed between `t1` and
    * `t2` (t1 < t2). A key "changes" when its covering version differs;
    * version identity = the `tieCol` of the covering row. Returns the
    * key columns + `change` ∈ {added, removed, changed} + both versions'
    * tie ids (NULL on the absent side) — the audit shape "what happened
    * to the table between the two nightly snapshots" without storing
    * either snapshot.
    */
  def snapshotDiff(history: DataFrame, keyCols: Seq[String], tieCol: String,
                   t1: Column, t2: Column): DataFrame = {
    val a = asOf(history, t1).select(
      keyCols.map(col) :+ col(tieCol).as("_v1"): _*)
    val b = asOf(history, t2).select(
      keyCols.map(col) :+ col(tieCol).as("_v2"): _*)
    a.join(b, keyCols, "full_outer")
      .withColumn("change",
        when(col("_v1").isNull, "added")
          .when(col("_v2").isNull, "removed")
          .when(col("_v1") =!= col("_v2"), "changed"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change") :+
        col("_v1").as("version_before") :+ col("_v2").as("version_after"): _*)
  }
}
