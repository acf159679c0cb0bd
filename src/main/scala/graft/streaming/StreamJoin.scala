package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM–STREAM interval join — the real-time enrichment
  * shape the batch `Temporal.rangeCount`/`rangeJoin` family answers
  * offline: match each left event with the right-stream events of the
  * same key inside `[leftTs − beforeUs, leftTs + afterUs]`, while both
  * sides are unbounded streams (CDC events × payment confirmations,
  * clicks × impressions). Works identically on batch frames —
  * `withWatermark` is a no-op there — which is exactly how the spec
  * pins the semantics: streaming output ≡ the batch join, with match
  * pairs deliberately straddling micro-batch boundaries so the join
  * STATE (not batch-local luck) produces them.
  *
  * Mechanics: Spark's stream-stream inner join buffers both sides in the
  * state store; the event-time range condition + both watermarks give
  * the engine the eviction bound (a right row older than
  * `watermark + beforeUs + afterUs` below the left watermark can never
  * match again and is dropped — state stays bounded by rate × window,
  * never by stream length). The range condition must reference the
  * raw event-time columns for that analysis to fire, so the operator
  * keeps the condition in `tsCol ± INTERVAL` form and requires the two
  * inputs to carry DISJOINT column names (the caller renames — no
  * silent aliasing of ambiguous columns).
  *
  * Delivery: inner-join rows emit as soon as both sides have arrived
  * (append mode); there is no "no match" row in a pure inner stream
  * join — left rows whose window closes unmatched simply never emit
  * (outer stream-stream joins emit NULLs only after the watermark
  * closes the window; the inner form is the latency-safe default).
  */
object StreamJoin {

  def intervalJoinStreams(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTs: String, rightTs: String,
                          beforeUs: Long, afterUs: Long,
                          watermark: String = "10 minutes"): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0,
      s"window bounds must be >= 0, got before=$beforeUs after=$afterUs")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left and right must have disjoint column names, both carry: " +
        overlap.mkString(", "))
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) -
          expr(s"INTERVAL $beforeUs MICROSECOND") &&
        col(rightTs) <= col(leftTs) +
          expr(s"INTERVAL $afterUs MICROSECOND"),
      "inner")
  }
}
