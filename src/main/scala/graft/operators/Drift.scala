package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift audit between two snapshots of a dataset — the
  * monitoring step a training-data pipeline runs between crawl/corpus
  * versions ("did the value distribution move? did the language mix
  * shift? did a category appear or vanish?") before committing a new
  * snapshot to training.
  *
  * Shape: both snapshots collapse to per-group count frames first — the
  * [[Quantiles]] log-bucketed histogram for numeric columns, plain
  * category counts for categorical ones — and every statistic is then
  * computed OVER THE COUNT FRAMES (≤ groups × 64·2^m rows, never data
  * rows). Comparing two 100 TB snapshots costs two histogram scans with
  * map-side combine plus a sketch-sized join; histograms maintained by
  * [[Quantiles.mergeBatch]] feed the same comparison without any rescan.
  *
  * Statistics, chosen for the repo's exactness discipline (integer
  * numerators over a common denominator — no order-sensitive float
  * accumulation in anything gated un-rounded):
  *
  *  - Kolmogorov–Smirnov D = max_i |cdfA(i) − cdfB(i)|, computed as the
  *    exact BIGINT `ks_num` = max |cumA_i·nB − cumB_i·nA| with the single
  *    IEEE division by nA·nB deferred to the end. Ordered (numeric)
  *    domains only.
  *  - Total variation TV = ½ Σ_i |pA_i − pB_i|, as the exact BIGINT
  *    `tv_num` = Σ |cntA_i·nB − cntB_i·nA| over 2·nA·nB.
  *  - Population stability index PSI = Σ (pA_i − pB_i)·ln(pA_i/pB_i)
  *    with half-count Laplace smoothing (pX_i = (cntX_i + ½)/(nX + K/2),
  *    K = union bucket count) so empty buckets are finite — the industry
  *    drift score, kept DOUBLE: `ln` is only 1-ulp-bounded (not correctly
  *    rounded) and the bucket sum is order-sensitive, so gated queries
  *    round it (the [[Hll]] estimator precedent) instead of hashing raw
  *    bits.
  *
  * Overflow bound: the numerators multiply a per-bucket count by the
  * other side's total — |d_i| ≤ 2·nA·nB must stay under 2^63, which
  * holds to ~2·10^9 rows PER GROUP per side. Beyond that (a single
  * group holding >2B rows), pre-shard the group or lift the products to
  * DECIMAL(38,0); the statistics themselves remain exact either way.
  */
object Drift {

  /** Numeric drift per group: histogram both sides with the same
    * [[Quantiles.bucketOf]] layout (positive longs — callers pre-scale,
    * e.g. cents), then KS + TV + PSI over the joined count frames.
    * Output per group: `n_a, n_b, buckets, ks_num, ks, tv_num, tv, psi`.
    */
  def histogramDrift(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                     valueCol: String,
                     m: Int = Quantiles.DefaultSubBucketBits): DataFrame =
    driftFromCounts(
      Quantiles.histogram(a, groupCols, valueCol, m),
      Quantiles.histogram(b, groupCols, valueCol, m),
      groupCols, keyCol = "bucket", ordered = true)

  /** Categorical drift per group (language mix, source mix, label
    * spread): category-count both sides, then TV + PSI plus the census
    * columns `cats_added` / `cats_removed` (categories seen only in B /
    * only in A — the "a new language appeared in the crawl" alarm).
    * No KS: category domains carry no order. NULL categories are
    * excluded, mirroring `GROUP BY` count semantics on the raw column.
    */
  def categoryDrift(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                    catCol: String): DataFrame = {
    def counts(df: DataFrame): DataFrame =
      df.filter(col(catCol).isNotNull)
        .groupBy((groupCols :+ catCol).map(col): _*)
        .agg(count(lit(1)).as("cnt"))
    driftFromCounts(counts(a), counts(b), groupCols, keyCol = catCol,
      ordered = false)
  }

  /** The shared comparison over two per-group count frames (`groupCols`,
    * `keyCol`, `cnt`): full-outer join on (group, key), zero-fill, then
    * the drift statistics over the joined sketch-sized frame. Windows
    * here run over count rows — bounded by the histogram/category
    * domain, never by data size (the [[Quantiles.quantilesFromHistogram]]
    * argument). Groups present on only one side yield NULL statistics
    * (nothing to compare against) rather than a division by zero.
    */
  def driftFromCounts(countsA: DataFrame, countsB: DataFrame,
                      groupCols: Seq[String], keyCol: String,
                      ordered: Boolean): DataFrame = {
    require(groupCols.nonEmpty,
      "need at least one group column (a global audit can group by a literal)")
    val keyAll = groupCols :+ keyCol
    val joined = countsA.withColumnRenamed("cnt", "cnt_a")
      .join(countsB.withColumnRenamed("cnt", "cnt_b"), keyAll, "full_outer")
      .select(keyAll.map(col) :+
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a") :+
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"): _*)

    val grp = Window.partitionBy(groupCols.map(col): _*)
    val nA = sum(col("cnt_a")).over(grp)
    val nB = sum(col("cnt_b")).over(grp)
    val k = count(lit(1)).over(grp)
    // exact integer per-bucket deviation: cnt_a·nB − cnt_b·nA. The
    // documented 2^63 bound is CHECKED, not assumed: every numerator
    // (per-bucket d, the cumulative ks_num, and tv_num = Σ|d|) is
    // bounded by 2·n_a·n_b, so n_a·n_b < 2^62 keeps all of them exact.
    // The check multiplies as doubles (the long product would itself
    // wrap): 2^62 is double-exact and rounding-to-nearest can only move
    // a boundary product ONTO 2^62 — excluded by the strict < — so no
    // overflowing group ever passes. Past the bound the group errors
    // instead of silently wrapping under non-ANSI arithmetic; pre-shard
    // the group or lift to DECIMAL as the scaladoc prescribes.
    val inBound = col("n_a").cast("double") * col("n_b").cast("double") <
      lit(4.611686018427387904e18)
    val d = when(inBound, col("cnt_a") * col("n_b") - col("cnt_b") * col("n_a"))
      .otherwise(raise_error(concat(
        lit("Drift numerator overflow: n_a*n_b >= 2^62 for group ("),
        concat_ws(",", groupCols.map(c => col(c).cast("string")): _*),
        lit(") — pre-shard the group or lift the products to DECIMAL(38,0)"))))
    // smoothed probabilities for PSI (K/2 total mass added per side)
    def p(cnt: Column, n: Column): Column =
      (cnt.cast("double") * 2d + 1d) / (n.cast("double") * 2d + col("k").cast("double"))
    val pA = p(col("cnt_a"), col("n_a"))
    val pB = p(col("cnt_b"), col("n_b"))

    val withTotals = joined
      .withColumn("n_a", nA).withColumn("n_b", nB).withColumn("k", k)
      .withColumn("d", d)
    val withCum =
      if (ordered)
        withTotals.withColumn("ks_row",
          abs(sum(col("d")).over(grp.orderBy(col(keyCol)))))
      else withTotals.withColumn("ks_row", lit(null).cast("long"))

    val base = withCum.groupBy(groupCols.map(col): _*)
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        count(lit(1)).as("buckets"),
        max(col("ks_row")).as("ks_num"),
        sum(abs(col("d"))).as("tv_num"),
        sum((pA - pB) * (log(pA) - log(pB))).as("psi_raw"),
        sum(when(col("cnt_a") === 0, 1L).otherwise(0L)).as("cats_added"),
        sum(when(col("cnt_b") === 0, 1L).otherwise(0L)).as("cats_removed"))
    driftSelect(base, groupCols, ordered)
  }

  /** Drift between two batch ranges of a MAINTAINED histogram table
    * ([[Quantiles.mergeBatch]]'s `_batch_id`-partitioned layout) — the
    * production monitoring shape: the stream keeps the histogram table
    * current, and "did this week move against last week?" is answered
    * from partition-pruned sketch reads alone, never a raw-data rescan.
    * Each side is the counter-sum merge of its batches (exactly the
    * one-shot histogram of that side's data), so the result is
    * bit-identical in its integer columns to [[histogramDrift]] over the
    * same rows.
    */
  def driftFromTable(spark: org.apache.spark.sql.SparkSession,
                     histTable: String, groupCols: Seq[String],
                     batchesA: Seq[Long], batchesB: Seq[Long]): DataFrame = {
    require(batchesA.intersect(batchesB).isEmpty,
      "snapshot sides must not share batches")
    val t = spark.table(histTable)
    def side(bs: Seq[Long]): DataFrame =
      Quantiles.mergeHistograms(
        t.filter(col("_batch_id").isin(bs: _*)).drop("_batch_id"), groupCols)
    driftFromCounts(side(batchesA), side(batchesB), groupCols,
      keyCol = "bucket", ordered = true)
  }

  /** EMBEDDING drift between two snapshots — the semantic sibling of the
    * value/category statistics above: per group (e.g. label, source,
    * model version), how far did the MEAN EMBEDDING move (centroid L2
    * shift) and how far did it rotate (centroid cosine)? The
    * model-version-skew / re-embedding monitor: a re-embedded corpus
    * whose centroids rotate is incompatible with the old ANN index
    * (compose with `AnnIndex.indexStaleness` for the rebuild trigger).
    *
    * Exactness discipline (floats can't sum order-independently, so the
    * operator NEVER sums floats): each component quantizes to
    * `floor(x · 2^24)` — float→double is exact, the scaled floor is one
    * deterministic op — then per-dim BIGINT sums are exact and
    * order-free. The statistics close over exact integers: with
    * centroids μ = s/(n·2^24), the shift numerator Σ_d (sa_d·n_b −
    * sb_d·n_a)² and the cosine's dot/norm sums are DECIMAL(38,0)
    * products of those BIGINTs (the CMS join-size discipline — a 64-dim
    * quantized sum squares past 2^63), and each output is ONE IEEE
    * chain over the exact numerators, gated raw. Quantization bias is
    * bounded by 2^-24 per component — two orders below any drift worth
    * alerting on — and identical in both engines, so the gate is exact
    * even though the measurement is approximate.
    *
    * Plan: one posexplode scan per side → (group, dim) BIGINT sums
    * (map-side combined, |groups|·dims rows), one equi-join of two
    * sketch-sized frames, one aggregation over dims. Two 100 TB
    * snapshots compare via frames the size of groups × dims.
    */
  def embeddingDrift(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                     vecCol: String): DataFrame = {
    val Q = 16777216L // 2^24
    def sums(df: DataFrame, n: String, s: String): DataFrame =
      df.select(groupCols.map(col) :+
          posexplode(col(vecCol)).as(Seq("_dim", "_e")): _*)
        .withColumn("_q", floor(col("_e").cast("double") * Q).cast("long"))
        .groupBy(groupCols.map(col) :+ col("_dim"): _*)
        .agg(count(lit(1)).as(n), sum(col("_q")).as(s))
    val d38 = "decimal(38,0)"
    val joined = sums(a, "n_a", "s_a")
      .join(sums(b, "n_b", "s_b"), groupCols :+ "_dim")
      .localCheckpoint(true) // reused by the bound check and the agg
    // CHECKED DECIMAL(38,0) bound (the histogram-drift lesson: enforce,
    // don't document): the shift numerator sums dims * diff^2 with
    // |diff| <= msa*mnb + msb*mna; refuse inputs whose worst case
    // overflows 38 digits instead of nulling silently under non-ANSI
    // decimal arithmetic.
    val lim = joined.agg(
      max(abs(col("s_a"))).as("msa"), max(abs(col("s_b"))).as("msb"),
      max(col("n_a")).as("mna"), max(col("n_b")).as("mnb"),
      count(lit(1)).as("cells")).head()
    if (lim.getLong(4) > 0) {
      val msa = BigInt(lim.getLong(0)); val msb = BigInt(lim.getLong(1))
      val mna = BigInt(lim.getLong(2)); val mnb = BigInt(lim.getLong(3))
      val cells = BigInt(lim.getLong(4))
      val maxDiff = msa * mnb + msb * mna
      val bound = BigInt(10).pow(38)
      require(maxDiff * maxDiff * cells < bound &&
        msa * msb * cells < bound && msa * msa * cells < bound &&
        msb * msb * cells < bound,
        s"embeddingDrift numerators can exceed DECIMAL(38,0): " +
          s"max|s|=($msa, $msb), max n=($mna, $mnb), cells=$cells — " +
          "pre-aggregate per shard or reduce group sizes")
    }
    val diff = col("s_a").cast(d38) * col("n_b").cast(d38) -
      col("s_b").cast(d38) * col("n_a").cast(d38)
    val agg = joined.groupBy(groupCols.map(col): _*)
      .agg(
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        sum((diff * diff).cast(d38)).cast(d38).as("shift_num"),
        sum((col("s_a").cast(d38) * col("s_b").cast(d38)).cast(d38))
          .cast(d38).as("dot"),
        sum((col("s_a").cast(d38) * col("s_a").cast(d38)).cast(d38))
          .cast(d38).as("aa"),
        sum((col("s_b").cast(d38) * col("s_b").cast(d38)).cast(d38))
          .cast(d38).as("bb"))
    agg.select(groupCols.map(col) ++ Seq(
      col("n_a"), col("n_b"),
      (sqrt(col("shift_num").cast("double")) /
        (col("n_a").cast("double") * col("n_b").cast("double") *
          lit(Q.toDouble))).as("l2_shift"),
      when(col("aa") > 0 && col("bb") > 0,
        col("dot").cast("double") /
          sqrt(col("aa").cast("double") * col("bb").cast("double")))
        .as("centroid_cos")): _*)
  }

  private def driftSelect(base: DataFrame, groupCols: Seq[String],
                          ordered: Boolean): DataFrame = {
    val den = col("n_a").cast("double") * col("n_b").cast("double")
    val bothSides = col("n_a") > 0 && col("n_b") > 0
    val ksCols =
      if (ordered) Seq(col("ks_num"),
        when(bothSides, col("ks_num").cast("double") / den).as("ks"))
      else Seq.empty[Column]
    val censusCols =
      if (ordered) Seq.empty[Column]
      else Seq(col("cats_added"), col("cats_removed"))
    base.select(groupCols.map(col) ++
      Seq(col("n_a"), col("n_b"), col("buckets")) ++ ksCols ++
      Seq(col("tv_num"),
        when(bothSides, col("tv_num").cast("double") / (den * 2d)).as("tv"),
        when(bothSides, col("psi_raw")).as("psi")) ++ censusCols: _*)
  }
}
