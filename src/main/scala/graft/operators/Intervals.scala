package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval OVERLAP join — pairs of rows whose [start, end] intervals
  * intersect (closed-interval semantics: `l.start <= r.end AND r.start <=
  * l.end`; a point interval start = end overlaps anything covering that
  * instant). The workload: user sessions × incident windows, ad
  * exposures × promotions, maintenance windows × SLO breaches.
  *
  * The scale problem: the overlap predicate has NO equality component, so
  * `left.join(right, overlapCond)` plans a BroadcastNestedLoopJoin — the
  * Θ(|L|·|R|) comparison matrix — the moment neither side broadcasts. At
  * 100 TB that plan never finishes.
  *
  * The standard fix (DuckDB/Postgres range-join bucketization, the
  * interval-tree-in-SQL idiom): quantize time into coarse BINS of
  * `binUs` micros. Each interval explodes to the bins it covers
  * (codegen'd `sequence()` — fan-out = interval length / binUs, the
  * caller-tuned tradeoff), the join becomes EQUI on the bin (+ any
  * caller equi-keys, e.g. a tenant column), and the true overlap
  * predicate filters pairs inside each bin. A pair sharing k bins would
  * emit k times; instead of a distinct-shuffle dedup, each pair is
  * emitted ONLY in its canonical bin — the bin holding
  * `greatest(l.start, r.start)` (the overlap region's first instant) —
  * so the join output is exact with zero post-dedup. One shuffle on
  * (bin ± keys); the bin key is dense and time-uniform, so the exchange
  * is skew-free for any workload whose intervals are.
  *
  * Bin sizing: fan-out per row is len/binUs + 1; pairs-per-bin grows as
  * bins coarsen. Set binUs ≈ the typical interval length — for
  * minutes-long sessions against hour-long incidents, the hour bin
  * bounds session fan-out at ~2 and incident fan-out at ~2 while
  * keeping per-bin population to concurrent intervals only.
  *
  * NULL starts/ends drop (an unbounded interval is a caller decision —
  * clamp before the join); `end >= start` is not required but inverted
  * intervals (end < start) cover no bins and match nothing, the
  * consistent empty-interval reading.
  */
object Intervals {

  /** Equi-keys + overlap join. `leftCols`/`rightCols` name the interval
    * bounds as micros-since-epoch BIGINT columns; `keys` are optional
    * extra equality columns present on BOTH sides (tenant, user …).
    * Output: every left column, then every right column (caller
    * disambiguates names beforehand), one row per overlapping pair.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  leftStart: String, leftEnd: String,
                  rightStart: String, rightEnd: String,
                  binUs: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binUs > 0, s"binUs must be positive, got $binUs")
    // end >= start is enforced here, not just documented: Spark's
    // sequence() silently DESCENDS for inverted bounds, which would give
    // an empty interval a full bin cover
    def binned(df: DataFrame, s: String, e: String, binCol: String) =
      df.filter(col(s).isNotNull && col(e).isNotNull && col(e) >= col(s))
        .withColumn(binCol, explode(sequence(
          call_function("div", col(s), lit(binUs)),
          call_function("div", col(e), lit(binUs)))))
    val l = binned(left, leftStart, leftEnd, "_bin")
    val r = binned(right, rightStart, rightEnd, "_rbin")
    val joinCond = (Seq(l("_bin") === r("_rbin")) ++
      keys.map(k => l(k) === r(k))).reduce(_ && _)
    val overlap = l(leftStart) <= r(rightEnd) && r(rightStart) <= l(leftEnd)
    // canonical-bin emission: the pair appears only where the overlap
    // region starts, so no distinct pass is needed afterwards
    val canonical = l("_bin") ===
      call_function("div", greatest(l(leftStart), r(rightStart)), lit(binUs))
    val rightKeep = right.columns.filterNot(keys.contains)
    l.join(r, joinCond && overlap && canonical, "inner")
      .select(left.columns.map(l(_)) ++ rightKeep.map(r(_)): _*)
  }
}
