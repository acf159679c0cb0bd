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
}
