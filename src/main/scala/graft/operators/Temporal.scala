package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/window operators Spark lacks as built-ins (builder brief:
  * as-of join, range join, sessionization) — all formulated as ONE shuffle
  * on the key column, never a per-key collect or an unbounded range rescan,
  * so they hold at 100 TB with the key as the (salted if skewed) partition
  * axis.
  */
object Temporal {

  /** Backward as-of join: for every left row, the single LATEST right row
    * with the same key and `rightTs <= leftTs` (inclusive — kdb/pandas
    * `merge_asof` semantics). Unmatched left rows get a NULL match struct.
    *
    * Implementation: tag both inputs, union, and take a running
    * `last(right_payload, ignoreNulls)` over (key) ordered by
    * (ts, side, tie) — right rows sort before the left row at equal ts, so
    * "at or before" is inclusive, and `tie` makes the winner among
    * equal-ts right rows deterministic (largest tie value). One shuffle on
    * key; state per row is O(1) — the classic scale-safe formulation, vs
    * the range-join rewrite which rescans every right row per left row.
    *
    * Returns all left columns plus `asCol` = struct of the matched right
    * row (null when no right row precedes).
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String, rightTie: String,
                       asCol: String = "asof"): DataFrame = {
    val l = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      struct(left.columns.map(col): _*).as("_l"))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(rightTie).dataType))
    val r = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      col(rightTie).as("_tie"),
      struct(right.columns.map(col): _*).as("_r"))
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*") +: Seq(col("_asof").as(asCol)): _*)
  }

  /** Per-key sessionization: adds `_session` (1-based running session index
    * within the key) — a new session starts when the gap to the previous
    * event exceeds `gapMicros`. Order within a key is (ts, tie), so ties
    * are deterministic. One shuffle on key.
    */
  def sessionIndex(df: DataFrame, key: String, tsCol: String, tieCol: String,
                   gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    df.withColumn("_new", when(prev.isNull || us - prev > gapMicros, 1).otherwise(0))
      .withColumn("_session", sum(col("_new")).over(run))
      .drop("_new")
  }

  /** Session aggregation on Spark's native `session_window` — the
    * streaming-capable sibling of `sessionIndex`, with the SAME boundary
    * rule: touching windows merge, so an event at exactly `last + gap`
    * stays in the session and only a strictly larger gap starts a new one
    * (asserted in TemporalSpec against both forms).
    *
    * Batch: one hash aggregate. Streaming: apply `withWatermark(tsCol, d)`
    * upstream; merged sessions emit in append mode once the watermark
    * passes their end, and per-key state is bounded by the session extent
    * plus the watermark delay.
    */
  def sessionAggregate(df: DataFrame, key: String, tsCol: String,
                       gap: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap).as("session"), col(key))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"))
      .select(col(key),
        col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_events"), col("first_ts"), col("last_ts"))

  /** Range-count: for each left row, how many right rows share the key with
    * `rightTs` in `[leftTs - windowMicros, leftTs)`. The key equality keeps
    * this a hash/sort-merge join (the range is a post-join filter), never a
    * nested-loop product; for keyless range joins, bin `ts` to windowMicros
    * buckets and join each left row to its two candidate bins.
    */
  def rangeCount(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String, windowMicros: Long,
                 asCol: String = "n_in_range"): DataFrame = {
    val lts = unix_micros(col(s"l.$leftTs"))
    val rts = unix_micros(col(s"r.$rightTs"))
    left.alias("l")
      .join(right.alias("r"),
        col(s"l.$key") === col(s"r.$key") &&
          rts >= lts - windowMicros && rts < lts,
        "left")
      .groupBy(left.columns.map(c => col(s"l.$c")): _*)
      .agg(count(col(s"r.$rightTs")).as(asCol))
  }
}
