package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/window operators Spark lacks as built-ins (builder brief:
  * as-of join, range join, sessionization) — all formulated as ONE shuffle
  * on the key column, never a per-key collect or an unbounded range rescan.
  *
  * Skew: the plain forms partition by key, so one viral key funnels
  * through one window task. The `*Salted` variants below split every key
  * into fixed time buckets — (key, bucket) is the partition unit — run the
  * sequential pass locally per bucket, and stitch bucket boundaries with a
  * per-(key, bucket) anchor carried over a per-key window whose row count
  * is the BUCKET count, not the event count. Results are exactly equal to
  * the plain forms (asserted row-for-row in TemporalSpec, including a
  * 90%-hot-key corpus); the hot key's work spreads across
  * events/bucketMicros tasks.
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

  /** Backward as-of join with a STALENESS TOLERANCE — the feature-store
    * contract "the latest feature value, but only if it is at most
    * `toleranceUs` old; otherwise no feature" (stale features silently
    * riding into training data is the classic feature-skew bug this
    * guards). Because the backward as-of match is the NEAREST preceding
    * right row, latest-within-tolerance ≡ latest-overall nulled when it
    * is too old — one scan-side `when` over `asofJoinBackward`'s output,
    * no new shuffle, same O(1)-state window plan.
    */
  def asofJoinBackwardTolerance(left: DataFrame, right: DataFrame,
                                key: String, leftTs: String, rightTs: String,
                                rightTie: String, toleranceUs: Long,
                                asCol: String = "asof"): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    asofJoinBackward(left, right, key, leftTs, rightTs, rightTie, asCol)
      .withColumn(asCol, when(
        col(asCol).isNotNull &&
          unix_micros(col(leftTs)) -
            unix_micros(col(asCol).getField(rightTs)) <= toleranceUs,
        col(asCol)))
  }

  /** Skew-resistant backward as-of join: identical semantics (and output)
    * to `asofJoinBackward`, but partitioned by (key, time bucket) so a hot
    * key spreads across tasks. Phase 1 runs the running-last window within
    * each bucket; phase 2 computes each bucket's LAST right row (the
    * anchor, `max_by` over (ts, tie) — the same winner the running window
    * would pick) and carries the latest preceding anchor across buckets
    * with a window over BUCKET rows (events/bucketMicros rows per key);
    * left rows with no in-bucket match coalesce to the carry-in. The
    * carry join hits the (key, bucket) partitioning the phase-1 window
    * already established, so the big side does not re-shuffle.
    *
    * `bucketMicros` trades balance against overhead: each hot key fans out
    * over its time-span/bucketMicros tasks; keys quiet within a bucket pay
    * one extra small shuffle of per-bucket anchors.
    */
  def asofJoinBackwardSalted(left: DataFrame, right: DataFrame, key: String,
                             leftTs: String, rightTs: String, rightTie: String,
                             bucketMicros: Long,
                             asCol: String = "asof"): DataFrame = {
    require(bucketMicros >= 1, s"bucketMicros must be >= 1, got $bucketMicros")
    val l = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      struct(left.columns.map(col): _*).as("_l"))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(rightTie).dataType))
    val r = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      col(rightTie).as("_tie"),
      struct(right.columns.map(col): _*).as("_r"))
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_b", floor(unix_micros(col("_ts")) / bucketMicros))
    val wLocal = Window.partitionBy("_k", "_b")
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("_local", last(col("_r"), ignoreNulls = true).over(wLocal))
    // per-(key, bucket) anchor = the bucket's last right row; carried
    // forward over the (tiny) per-key bucket sequence. Buckets with no
    // right row still need a carry, so anchors attach to ALL buckets seen.
    val anchors = u.groupBy(col("_k"), col("_b"))
      .agg(max_by(col("_r"), when(col("_side") === 0,
        struct(col("_ts"), col("_tie")))).as("_anchor"))
    val wPrev = Window.partitionBy("_k").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = anchors
      .withColumn("_carry", last(col("_anchor"), ignoreNulls = true).over(wPrev))
      .select(col("_k"), col("_b"), col("_carry"))
    local.filter(col("_side") === 1)
      .join(carries, Seq("_k", "_b"))
      .select(col("_l.*") +: Seq(coalesce(col("_local"), col("_carry")).as(asCol)): _*)
  }

  /** FORWARD as-of join — the attribution direction: for every left row,
    * the single EARLIEST right row with the same key and
    * `rightTs >= leftTs` (inclusive): "the next click after this
    * impression", "the first error after this deploy". Same union +
    * running-window construction as [[asofJoinBackward]], mirrored: a
    * `first(right_payload, ignoreNulls)` over the FOLLOWING frame,
    * ordered (ts, side, tie) with the LEFT side sorting first at equal
    * ts so "at or after" stays inclusive; the winner among equal-ts
    * right rows is the SMALLEST tie value (first in order). One shuffle
    * on key, O(1) state per row; for hot keys the salted-bucket
    * treatment of `asofJoinBackwardSalted` applies symmetrically.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String, rightTie: String,
                      asCol: String = "asof"): DataFrame = {
    val l = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      struct(left.columns.map(col): _*).as("_l"))
      .withColumn("_side", lit(0))
      .withColumn("_tie", lit(null).cast(right.schema(rightTie).dataType))
    val r = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      col(rightTie).as("_tie"),
      struct(right.columns.map(col): _*).as("_r"))
      .withColumn("_side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u.withColumn("_asof", first(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(col("_l.*") +: Seq(col("_asof").as(asCol)): _*)
  }

  /** Skew-resistant FORWARD as-of join: identical semantics (and output)
    * to [[asofJoinForward]], partitioned by (key, time bucket) — the
    * mirror of [[asofJoinBackwardSalted]]: phase 1 runs the running-first
    * window within each bucket; phase 2 takes each bucket's FIRST right
    * row (`min_by` over (ts, tie) — the same winner the running window
    * picks) and carries the earliest FOLLOWING anchor backward across the
    * per-key bucket sequence; left rows with no in-bucket match coalesce
    * to the carry-in from later buckets.
    */
  def asofJoinForwardSalted(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String, rightTie: String,
                            bucketMicros: Long,
                            asCol: String = "asof"): DataFrame = {
    require(bucketMicros >= 1, s"bucketMicros must be >= 1, got $bucketMicros")
    val l = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      struct(left.columns.map(col): _*).as("_l"))
      .withColumn("_side", lit(0))
      .withColumn("_tie", lit(null).cast(right.schema(rightTie).dataType))
    val r = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      col(rightTie).as("_tie"),
      struct(right.columns.map(col): _*).as("_r"))
      .withColumn("_side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_b", floor(unix_micros(col("_ts")) / bucketMicros))
    val wLocal = Window.partitionBy("_k", "_b")
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val local = u.withColumn("_local",
      first(col("_r"), ignoreNulls = true).over(wLocal))
    val anchors = u.groupBy(col("_k"), col("_b"))
      .agg(min_by(col("_r"), when(col("_side") === 1,
        struct(col("_ts"), col("_tie")))).as("_anchor"))
    val wNext = Window.partitionBy("_k").orderBy("_b")
      .rowsBetween(1, Window.unboundedFollowing)
    val carries = anchors
      .withColumn("_carry", first(col("_anchor"), ignoreNulls = true).over(wNext))
      .select(col("_k"), col("_b"), col("_carry"))
    local.filter(col("_side") === 0)
      .join(carries, Seq("_k", "_b"))
      .select(col("_l.*") +: Seq(coalesce(col("_local"), col("_carry")).as(asCol)): _*)
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

  /** Skew-resistant sessionization: identical output to `sessionIndex`,
    * partitioned by (key, time bucket). Session-start flags are local
    * except each bucket's FIRST row, whose gap tests against the previous
    * nonempty bucket's max ts (carried per key over bucket rows); the
    * 1-based session index is the local running flag sum plus the per-key
    * running total of earlier buckets' flags — both windows over bucket
    * counts, never event counts, except the in-bucket pass.
    */
  def sessionIndexSalted(df: DataFrame, key: String, tsCol: String,
                         tieCol: String, gapMicros: Long,
                         bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1, s"bucketMicros must be >= 1, got $bucketMicros")
    val us = unix_micros(col(tsCol))
    val d = df.withColumn("_b", floor(us / bucketMicros))
    val wLoc = Window.partitionBy(col(key), col("_b")).orderBy(col(tsCol), col(tieCol))
    val wLocRun = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy(col(key)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // previous nonempty bucket's max ts == max ts over ALL earlier buckets
    // (buckets are time-ordered)
    val carry = d.groupBy(col(key), col("_b")).agg(max(us).as("_maxTs"))
      .withColumn("_prevTs", max(col("_maxTs")).over(wPrev))
      .select(col(key), col("_b"), col("_prevTs"))
    val prevLoc = lag(us, 1).over(wLoc)
    val flagged = d.join(carry, Seq(key, "_b"))
      .withColumn("_new",
        when(prevLoc.isNotNull, when(us - prevLoc > gapMicros, 1).otherwise(0))
          .otherwise(when(col("_prevTs").isNull || us - col("_prevTs") > gapMicros, 1)
            .otherwise(0)))
    // per-bucket flag totals, running-summed over earlier buckets = offset
    val offsets = flagged.groupBy(col(key), col("_b"))
      .agg(sum(col("_new")).as("_bTotal"))
      .withColumn("_off", coalesce(sum(col("_bTotal")).over(wPrev), lit(0L)))
      .select(col(key), col("_b"), col("_off"))
    flagged.join(offsets, Seq(key, "_b"))
      .withColumn("_session", col("_off") + sum(col("_new")).over(wLocRun))
      .select(df.columns.map(col) :+ col("_session"): _*)
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

  /** Hopping (sliding) event-time windows beside [[sessionAggregate]]'s
    * gap windows and WindowedRules' tumbling ones: per (key, window
    * start) count + sum over epoch-aligned windows of `windowLen` every
    * `slide` — "events and revenue over the trailing hour, refreshed
    * every 15 minutes". Built on native `window()`, so the IDENTICAL
    * call runs under Structured Streaming (append mode once the
    * watermark passes a window's end — tested) and batch; each row
    * fans out to windowLen/slide windows inside the codegen'd
    * generator, then one shuffle on (key, window). The fan-out factor
    * is the overlap count — fixed by the chosen geometry, independent
    * of data size.
    */
  def hoppingAggregate(df: DataFrame, key: String, tsCol: String,
                       value: Column, windowLen: String,
                       slide: String): DataFrame =
    df.groupBy(window(col(tsCol), windowLen, slide), col(key))
      .agg(count(lit(1)).as("n"), sum(value).as("val_sum"))
      .select(col(key), col("window.start").as("win_start"),
        col("n"), col("val_sum"))

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
    // group on a synthetic unique row id, not the left columns: two left
    // rows equal on every column must each keep their own count ("for each
    // left row"), not collapse into one summed row. The id is evaluated
    // before the join, so each left row's fan-out regroups to exactly
    // that row.
    left.withColumn("_rid", monotonically_increasing_id()).alias("l")
      .join(right.alias("r"),
        col(s"l.$key") === col(s"r.$key") &&
          rts >= lts - windowMicros && rts < lts,
        "left")
      .groupBy(col("l._rid"))
      .agg(first(col(s"l.${left.columns.head}")).as(left.columns.head),
        left.columns.tail.map(c => first(col(s"l.$c")).as(c)) :+
          count(col(s"r.$rightTs")).as(asCol): _*)
      .drop("_rid")
  }

  /** Cohort retention: users grouped by the DATE of their first event, then
    * counted per (cohort, days-since-cohort) active day — the standard
    * product-analytics retention matrix. Output: (cohort_date, offset_days,
    * n_users), offset 0 = the cohort's size.
    *
    * Scale shape: the event stream collapses to DISTINCT (user, day) first
    * (partial-aggregated map-side, so the shuffle carries active-days, not
    * raw events), first-day extraction reuses that compacted set, and the
    * user-keyed join distributes on user_id. The (cohort, offset) count is
    * a plain count — (user, day) pairs are unique after the distinct, so
    * no count-distinct state is needed anywhere.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val active = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("d"))
      .distinct()
      // one (user, day) compaction feeds both the first-day aggregate and
      // the join probe side
      .localCheckpoint(true)
    val first = active.groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort_date"))
    active.join(first, Seq("user_id"))
      .groupBy(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).cast("bigint").as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Fixed-interval resampling WITH GAP FILL — the time-series
    * regularization step (downsample to a uniform grid, materialize the
    * empty intervals, carry the last observation forward) that feeds
    * anomaly detection, charting, and feature windows. Spark gives the
    * binning for free but not the gaps: a groupBy never emits a bin with
    * no rows, so the carry-forward has nothing to stand on. Here the
    * per-key grid comes from `sequence(min_bin, max_bin)` (an explode
    * that is linear in each key's OWN span, never the global one), a left
    * join re-attaches the observed bins, and the fill is the
    * count-of-non-nulls trick: a running `count(v)` partitions each key's
    * timeline into fill groups whose single non-null value is the
    * carried one — two window passes, both O(1) state per row, no
    * IGNORE NULLS dependency (identical semantics in any engine).
    *
    * `valueCents` aggregates exactly (integer cents, the repo's money
    * discipline), so resampled series replay bit-for-bit. Scale: one
    * (key, bin) shuffle for the binning, one key shuffle for spans +
    * windows — a key's task holds its bin count, not its event count.
    * Returns (key, bin, cents, n_obs): `n_obs` = 0 marks filled gaps;
    * `cents` on a gap row is the last observed bin's sum.
    */
  def resampleWithFill(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, intervalUs: Long): DataFrame = {
    require(intervalUs > 0, s"intervalUs must be positive, got $intervalUs")
    val cents = floor(col(valueCol) * 100).cast("long")
    // FLOOR division, not `div` (which truncates toward zero): pre-epoch
    // micros would otherwise collapse bins -1 and 0 into one double-width
    // bin and misalign the sequence(lo, hi) grid. pmod keeps the
    // remainder non-negative, so (us - pmod) is an exact multiple and the
    // div below is floor semantics for every timestamp.
    val us = unix_micros(col(tsCol))
    val bin = call_function("div", us - pmod(us, lit(intervalUs)), lit(intervalUs))
    val binned = df
      .select(col(keyCol).as("key"), bin.as("bin"), cents.as("c"))
      .groupBy(col("key"), col("bin"))
      .agg(sum(col("c")).as("obs_cents"), count(lit(1)).as("n_obs"))
    val grid = binned.groupBy(col("key"))
      .agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"))
      .select(col("key"), explode(sequence(col("lo"), col("hi"))).as("bin"))
    val joined = grid.join(binned, Seq("key", "bin"), "left")
    val order = Window.partitionBy(col("key")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fillGroup = count(col("obs_cents")).over(order)
    val filled = joined.withColumn("_fg", fillGroup)
    filled
      .withColumn("cents",
        max(col("obs_cents")).over(
          Window.partitionBy(col("key"), col("_fg"))))
      .select(col("key"), col("bin"), col("cents"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
  }

  /** Fixed-interval resampling with LINEAR INTERPOLATION over gaps — the
    * sibling of `resampleWithFill` for signals where carrying the last
    * observation misstates the trend (sensor readings, account balances
    * between statements). Same floor-division binning and per-key
    * `sequence()` grid; each empty bin takes the straight line between
    * its nearest observed bins on either side. The grid spans exactly
    * [min observed bin, max observed bin] per key, so every gap has BOTH
    * neighbors — no extrapolation, by construction.
    *
    * Exactness discipline: observed bins carry integer cents (exactly
    * representable as doubles far past any money scale); an interpolated
    * bin is `prev + (next − prev) · (bin − prev_bin) / (next_bin −
    * prev_bin)` with the three differences exact BIGINTs and ONE IEEE
    * multiply-divide-add chain both engines execute verbatim — the
    * raw-gated Drift discipline, no rounding anywhere.
    *
    * Plan shape: one key shuffle; the previous neighbor is a running
    * `last(ignoreNulls)` (O(1) state), the next neighbor the mirrored
    * `first(ignoreNulls)` over the following frame — two window passes
    * over one partitioning, never a self-join.
    */
  def resampleInterpolate(df: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, intervalUs: Long): DataFrame = {
    require(intervalUs > 0, s"intervalUs must be positive, got $intervalUs")
    val cents = floor(col(valueCol) * 100).cast("long")
    val us = unix_micros(col(tsCol))
    val bin = call_function("div", us - pmod(us, lit(intervalUs)), lit(intervalUs))
    val binned = df
      .select(col(keyCol).as("key"), bin.as("bin"), cents.as("c"))
      .groupBy(col("key"), col("bin"))
      .agg(sum(col("c")).as("obs_cents"), count(lit(1)).as("n_obs"))
    val grid = binned.groupBy(col("key"))
      .agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"))
      .select(col("key"), explode(sequence(col("lo"), col("hi"))).as("bin"))
    val joined = grid.join(binned, Seq("key", "bin"), "left")
    val byBin = Window.partitionBy(col("key")).orderBy(col("bin"))
    val past = byBin.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = byBin.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBin = when(col("obs_cents").isNotNull, col("bin"))
    val interpolated = joined
      .withColumn("_pc", last(col("obs_cents"), ignoreNulls = true).over(past))
      .withColumn("_pb", last(obsBin, ignoreNulls = true).over(past))
      .withColumn("_nc", first(col("obs_cents"), ignoreNulls = true).over(future))
      .withColumn("_nb", first(obsBin, ignoreNulls = true).over(future))
    interpolated
      .withColumn("cents",
        when(col("obs_cents").isNotNull, col("obs_cents").cast("double"))
          .otherwise(col("_pc").cast("double") +
            (col("_nc") - col("_pc")).cast("double") *
              (col("bin") - col("_pb")).cast("double") /
              (col("_nb") - col("_pb")).cast("double")))
      .select(col("key"), col("bin"), col("cents"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
  }

  /** First-order Markov transition matrix over per-key ordered event
    * sequences: `(from_state, to_state, n, p)` where `n` counts adjacent
    * pairs and `p = n / Σ_to n` is the empirical transition probability —
    * the session-model / synthetic-data estimator (and the CDC shape
    * "which state moves to which": the aggregate view of
    * `Suppress`'s transitions).
    *
    * One shuffle on the key for the `lead` window (per-key partitions,
    * never a global window), then a map-side-combined count over at most
    * |states|² groups. The normalizing totals join is |states| rows —
    * broadcast by construction. `p` is ONE IEEE division of two exact
    * BIGINTs (the Drift discipline: raw-gated, no rounding).
    */
  def transitionMatrix(df: DataFrame, key: String, tsCol: String,
                       tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("_to", lead(col(stateCol), 1).over(w))
      .filter(col("_to").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("_to").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_state"))
      .agg(sum(col("n")).as("_tot"))
    pairs.join(broadcast(totals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        (col("n").cast("double") / col("_tot").cast("double")).as("p"))
  }
}
