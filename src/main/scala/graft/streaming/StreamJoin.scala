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
  * (append mode). `joinType = "leftOuter"` adds the "no match" rows —
  * a left row whose window the watermark has CLOSED with no partner
  * emits once with NULL right columns; until the watermark passes, the
  * engine cannot know no partner is coming, so outer rows are
  * inherently watermark-delayed (the spec pins both the emission and
  * the delay: an unmatched row at the stream TAIL, whose window no
  * watermark ever closes, does NOT emit under AvailableNow — push the
  * watermark to flush, the documented Spark contract). The inner form
  * stays the latency-safe default.
  */
object StreamJoin {

  def intervalJoinStreams(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTs: String, rightTs: String,
                          beforeUs: Long, afterUs: Long,
                          watermark: String = "10 minutes",
                          joinType: String = "inner"): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0,
      s"window bounds must be >= 0, got before=$beforeUs after=$afterUs")
    require(Set("inner", "leftOuter").contains(joinType),
      s"joinType must be inner or leftOuter, got $joinType")
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
      joinType)
  }
}
