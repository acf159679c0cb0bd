package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered shuffle join — the explicit runtime-filter form of a
  * selective dim ⋈ huge fact join (the same statistic Spark's AQE runtime
  * bloom filter injects when it can; here it is an OPERATOR, available on
  * any plan shape and with caller-controlled sizing).
  *
  * The scale problem: `fact JOIN dim` shuffles the ENTIRE fact table on
  * the join key even when the dim side keeps 1% of the keys — at 100 TB
  * the exchange, not the join, is the cost. A Bloom filter of the dim
  * keys (one small aggregate on the already-filtered dim) applied to the
  * fact side BEFORE the exchange drops ~99% of fact rows at scan time, so
  * only matching-key rows (plus the fpp false-positive mass) ever enter
  * the shuffle.
  *
  * Correctness is UNCONDITIONAL: the Bloom filter never misses a present
  * key (one-sided error), and every false positive that survives the
  * prefilter is dropped by the exact inner join that follows — the result
  * is row-identical to the plain join at ANY fpp, which is exactly what
  * the `q23_bloom_join` oracle (a plain SQL join) checks. fpp only moves
  * the performance point, never the answer.
  *
  * Mechanics follow `Curation.decontaminateBloom`: the dim keys aggregate
  * through Spark's own `BloomFilterAggregate` (the runtime-filter clamps
  * lifted for the one aggregation so the requested sizing is realized),
  * the resulting ~`optimalNumOfBits(n, fpp)` filter rides into the fact
  * scan as ONE binary literal inside codegen'd `BloomFilterMightContain`
  * — broadcast-by-literal, no join, no exchange on the dim side beyond
  * its own 1-row aggregate. `JoinPruneSpec` asserts the prefilter sits
  * BELOW the fact-side exchange and that the joined result equals the
  * plain join exactly.
  *
  * Keys must be BIGINT-compatible (`BloomFilterAggregate`'s long path) —
  * the TPC-H surrogate-key shape. NULL fact keys never match an inner
  * join and are dropped by the prefilter (`might_contain(NULL)` is NULL).
  */
object JoinPrune {

  /** `fact ⋈ dim ON fact(factKey) = dim(dimKey)`, with the fact side
    * Bloom-prefiltered before its shuffle. Output columns = fact.* then
    * dim.* minus its join key (the equi-key appears once, from the fact
    * side), exactly as `fact.join(dim, fact(factKey) === dim(dimKey))`
    * after dropping the duplicate key column.
    *
    * `expectedKeys` sizes the filter without an extra dim pass; 0 means
    * count the dim side (one cheap job on the small side).
    */
  def bloomPrefilteredJoin(fact: DataFrame, dim: DataFrame,
                           factKey: String, dimKey: String,
                           fpp: Double = 0.01,
                           expectedKeys: Long = 0L): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val keyType = dim.schema(dimKey).dataType
    val integral = keyType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(integral,
      s"bloomPrefilteredJoin needs an integral join key, got $keyType " +
        s"for '$dimKey' — hash wider types to a long first")

    val spark = dim.sparkSession
    val dimKeys = dim.select(col(dimKey).cast("long").as("_k"))
    val est = math.max(1L,
      if (expectedKeys > 0) expectedKeys else dimKeys.count())
    // floor at 64 bits: optimalNumOfBits rounds to 0 for degenerate
    // (tiny n, fpp -> 1) inputs, which BloomFilterAggregate rejects
    val numBits = math.max(64L,
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(est, fpp))
    val bloomAgg = new BloomFilterAggregate(
      UnresolvedAttribute("_k"), Literal(est), Literal(numBits))
      .toAggregateExpression()
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val oldItems = spark.conf.get(itemsKey)
    val oldBits = spark.conf.get(bitsKey)
    val bloomBytes =
      try {
        spark.conf.set(itemsKey, math.max(est, oldItems.toLong))
        spark.conf.set(bitsKey, math.max(numBits, oldBits.toLong))
        dimKeys.select(ColumnBridge.column(bloomAgg).as("bf"))
          .head().getAs[Array[Byte]](0)
      } finally {
        spark.conf.set(itemsKey, oldItems)
        spark.conf.set(bitsKey, oldBits)
      }

    val prefiltered =
      if (bloomBytes == null) fact.filter(lit(false)) // empty dim side
      else fact.filter(ColumnBridge.column(BloomFilterMightContain(
        Literal.create(bloomBytes,
          org.apache.spark.sql.types.BinaryType),
        ColumnBridge.expression(col(factKey).cast("long")))))
    prefiltered
      .join(dim, prefiltered(factKey) === dim(dimKey), "inner")
      .drop(dim(dimKey))
  }

  /** The strategy the sketch-driven chooser picked. */
  sealed trait JoinChoice
  /** Dim fits the broadcast budget → broadcast hash join, no fact shuffle. */
  case object BroadcastDim extends JoinChoice
  /** Dim too big to broadcast but the join is selective on the fact side →
    * Bloom-prefilter the fact scan before its exchange. */
  case object BloomPrefiltered extends JoinChoice
  /** Most fact rows match anyway → the prefilter would scan-and-keep;
    * plain shuffle join. */
  case object PlainShuffle extends JoinChoice
  /** Confirmed heavy fact keys exist → those keys join on a broadcast
    * path and only the rest shuffles (the hot key never funnels one
    * reducer). */
  case object SkewSplit extends JoinChoice

  /** Exact row count from a CMS sketch frame: every hash row's counters
    * sum to N (each value lands in exactly one cell per row), so
    * Σcnt / depth is the count of non-NULL key rows — a statistic read
    * from 32 KB, no scan. Empty sketch → 0.
    */
  def sketchRowCount(sk: DataFrame, depth: Int = 4): Long = {
    val r = sk.agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
    r / depth
  }

  /** Pick the join strategy for `fact ⋈ dim` from the two sides'
    * MAINTAINED CMS sketches over the join key — the planner decision at
    * 100 TB costs two 32 KB aggregates and one broadcast sketch join,
    * never a scan of either table (`CountMin.mergeBatch` keeps the
    * sketches current per micro-batch; `CountMin.joinSizeEstimate` is the
    * cardinality statistic).
    *
    * The ladder, with every error one-sided toward the SAFE plan:
    *  - dim rows (exact from its sketch) ≤ `broadcastMaxRows` →
    *    [[BroadcastDim]];
    *  - else if est(join)/fact rows ≤ `bloomMaxMatchFraction` →
    *    [[BloomPrefiltered]] (the estimate only OVERcounts — collision
    *    cross-terms are nonnegative — so a join that looks selective IS
    *    selective; one that is selective may merely miss the prefilter
    *    upside, never pay a wrong-plan cliff);
    *  - else [[PlainShuffle]] (including the NULL-estimate overflow
    *    regime — an unbounded-looking join never routes through a
    *    prefilter built on its own flood).
    *
    * `bloomMaxMatchFraction` compares the JOIN OUTPUT estimate to fact
    * rows: for the key-unique dim of the TPC-H star shape the join output
    * equals the matched fact rows, making the ratio exactly the
    * prefilter's keep fraction; a many-to-many dim inflates it, which
    * again errs toward the plain join.
    */
  def chooseJoin(skFact: DataFrame, skDim: DataFrame, depth: Int = 4,
                 broadcastMaxRows: Long = 1000000L,
                 bloomMaxMatchFraction: Double = 0.5): JoinChoice = {
    require(broadcastMaxRows >= 0 && bloomMaxMatchFraction >= 0.0 &&
      bloomMaxMatchFraction <= 1.0,
      s"bad thresholds: broadcastMaxRows=$broadcastMaxRows " +
        s"bloomMaxMatchFraction=$bloomMaxMatchFraction")
    val nDim = sketchRowCount(skDim, depth)
    if (nDim <= broadcastMaxRows) BroadcastDim
    else {
      val nFact = sketchRowCount(skFact, depth)
      val est = CountMin.joinSizeEstimate(skFact, skDim, depth)
        .head().getAs[java.lang.Long](0)
      if (est != null && nFact > 0 &&
        est.toDouble <= bloomMaxMatchFraction * nFact.toDouble)
        BloomPrefiltered
      else PlainShuffle
    }
  }

  /** `fact ⋈ dim ON fact(factKey) = dim(dimKey)` through the strategy the
    * sketches pick — identical rows on every path (broadcast/bloom/plain
    * are all the same exact inner join; only the physical plan moves),
    * which is what the `q32_adaptive_join` plain-join oracle checks.
    * Output columns: fact.* then dim.* minus `dimKey`, on every path.
    *
    * The dim row count already read from the sketch sizes the Bloom
    * filter (`expectedKeys`), so the bloom path adds no dim count job.
    */
  def adaptiveJoin(fact: DataFrame, dim: DataFrame,
                   factKey: String, dimKey: String,
                   skFact: DataFrame, skDim: DataFrame, depth: Int = 4,
                   broadcastMaxRows: Long = 1000000L,
                   bloomMaxMatchFraction: Double = 0.5,
                   fpp: Double = 0.01): DataFrame =
    chooseJoin(skFact, skDim, depth, broadcastMaxRows,
      bloomMaxMatchFraction) match {
      case BroadcastDim =>
        fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "inner")
          .drop(dim(dimKey))
      case BloomPrefiltered =>
        bloomPrefilteredJoin(fact, dim, factKey, dimKey, fpp,
          expectedKeys = sketchRowCount(skDim, depth))
      case PlainShuffle =>
        fact.join(dim, fact(factKey) === dim(dimKey), "inner")
          .drop(dim(dimKey))
      case SkewSplit => // never produced by chooseJoin (see chooseJoinSkew)
        fact.join(dim, fact(factKey) === dim(dimKey), "inner")
          .drop(dim(dimKey))
    }

  /** Candidate heavy-hitter keys CONFIRMED against the fact-side CMS:
    * point-estimate each candidate (min over the d counters — a
    * broadcast-sketch join, never a fact scan) and keep those at or
    * above `heavyMinRows`. Candidates come from the maintained
    * SpaceSaving summary (`FreqItemsState.summaryFromTable` — any key
    * with true share > 1/m is guaranteed present) or any other small
    * key frame; the output is candidate-bounded, so downstream
    * broadcasts are sized by construction.
    *
    * Error posture: the CMS only OVERcounts, so a light key may be
    * confirmed heavy (it rides the broadcast path — harmless, identical
    * rows) but a key estimated light IS light; a truly heavy key absent
    * from the candidate set stays on the shuffle path, which is exactly
    * the pre-split behavior — every failure mode degrades the plan,
    * never the answer.
    */
  def confirmedHeavyKeys(skFact: DataFrame, candidates: DataFrame,
                         keyCol: String, heavyMinRows: Long,
                         depth: Int = 4, widthLog2: Int = 10): DataFrame = {
    require(heavyMinRows > 0, s"heavyMinRows must be positive, got $heavyMinRows")
    CountMin.pointEstimates(skFact, candidates, keyCol, depth, widthLog2)
      .filter(col("cms_est") >= heavyMinRows)
      .select(col(keyCol))
  }

  /** The two-route skew join: fact rows whose key is in `heavy` join a
    * broadcast of the dim rows for those keys (no shuffle touches the
    * hot keys at all — stronger than salting, which still shuffles R
    * replicas); the remaining fact rows take the plain shuffle join.
    * Identical rows to the plain join on every route (`q36_skew_join`'s
    * plain-join oracle): NULL fact keys fall to the rest route and drop
    * in its inner join, heavy-route false positives (CMS overcounts)
    * just ride the broadcast.
    *
    * `heavy` must be a small frame (candidate-bounded —
    * [[confirmedHeavyKeys]]'s contract); dim-side multiplicity on the
    * heavy keys must be broadcast-sized (the key-unique star-schema dim
    * trivially is: |dimHeavy| <= |heavy|).
    */
  def skewSplitJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    heavy: DataFrame): DataFrame = {
    val hk = broadcast(
      heavy.select(col(heavy.columns.head).cast("long").as("_hk"))
        .filter(col("_hk").isNotNull).distinct())
    val factHeavy = fact.join(hk,
      fact(factKey).cast("long") === hk("_hk"), "left_semi")
    val factRest = fact.join(hk,
      fact(factKey).cast("long") === hk("_hk"), "left_anti")
    val dimHeavy = dim.join(hk,
      dim(dimKey).cast("long") === hk("_hk"), "left_semi")
    factHeavy.join(broadcast(dimHeavy),
        factHeavy(factKey) === dimHeavy(dimKey), "inner")
      .drop(dimHeavy(dimKey))
      .unionByName(
        factRest.join(dim, factRest(factKey) === dim(dimKey), "inner")
          .drop(dim(dimKey)))
  }

  /** The skew-aware ladder ([[chooseJoin]] + heavy-hitter routing):
    * broadcast-able dims short-circuit as before (skew is irrelevant
    * when nothing shuffles); otherwise candidates confirmed heavy by the
    * fact sketch upgrade the choice to [[SkewSplit]]; otherwise the
    * bloom/plain ladder decides. The skew decision reads two sketches
    * and a candidate-bounded frame — still no scan of either table.
    */
  def chooseJoinSkew(skFact: DataFrame, skDim: DataFrame,
                     candidates: DataFrame, candidateCol: String,
                     heavyMinRows: Long,
                     depth: Int = 4, widthLog2: Int = 10,
                     broadcastMaxRows: Long = 1000000L,
                     bloomMaxMatchFraction: Double = 0.5): JoinChoice =
    chooseJoin(skFact, skDim, depth, broadcastMaxRows,
      bloomMaxMatchFraction) match {
      case BroadcastDim => BroadcastDim
      case other =>
        val anyHeavy = !confirmedHeavyKeys(skFact, candidates, candidateCol,
          heavyMinRows, depth, widthLog2).isEmpty
        if (anyHeavy) SkewSplit else other
    }

  /** [[adaptiveJoin]] with skew routing: identical rows on every path;
    * only the physical plan moves. On [[SkewSplit]] the heavy keys take
    * the broadcast route and the rest takes the plain shuffle (the
    * bloom prefilter composes with the rest route when the base ladder
    * picked it — the heavy keys would dominate its keep fraction
    * otherwise).
    */
  def adaptiveJoinSkew(fact: DataFrame, dim: DataFrame,
                       factKey: String, dimKey: String,
                       skFact: DataFrame, skDim: DataFrame,
                       candidates: DataFrame, candidateCol: String,
                       heavyMinRows: Long,
                       depth: Int = 4, widthLog2: Int = 10,
                       broadcastMaxRows: Long = 1000000L,
                       bloomMaxMatchFraction: Double = 0.5,
                       fpp: Double = 0.01): DataFrame = {
    val base = chooseJoin(skFact, skDim, depth, broadcastMaxRows,
      bloomMaxMatchFraction)
    // the heavy frame is candidate-bounded — localCheckpoint so the
    // emptiness probe and the split don't re-run the candidate plan
    lazy val heavy = confirmedHeavyKeys(skFact, candidates, candidateCol,
      heavyMinRows, depth, widthLog2).localCheckpoint(true)
    if (base == BroadcastDim || heavy.isEmpty)
      adaptiveJoin(fact, dim, factKey, dimKey, skFact, skDim, depth,
        broadcastMaxRows, bloomMaxMatchFraction, fpp)
    else base match {
      case BloomPrefiltered =>
        // the rest route keeps the prefilter the base ladder earned —
        // with the heavy keys carved out, its keep fraction is honest
        val hk = broadcast(heavy
          .select(col(heavy.columns.head).cast("long").as("_hk"))
          .filter(col("_hk").isNotNull).distinct())
        val factHeavy = fact.join(hk,
          fact(factKey).cast("long") === hk("_hk"), "left_semi")
        val factRest = fact.join(hk,
          fact(factKey).cast("long") === hk("_hk"), "left_anti")
        val dimHeavy = dim.join(hk,
          dim(dimKey).cast("long") === hk("_hk"), "left_semi")
        factHeavy.join(broadcast(dimHeavy),
            factHeavy(factKey) === dimHeavy(dimKey), "inner")
          .drop(dimHeavy(dimKey))
          .unionByName(bloomPrefilteredJoin(factRest, dim, factKey,
            dimKey, fpp, expectedKeys = sketchRowCount(skDim, depth)))
      case _ => skewSplitJoin(fact, dim, factKey, dimKey, heavy)
    }
  }
}
