package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Basket co-occurrence projection — build the weighted item–item graph
  * ("parts ordered together", "docs citing the same source", "co-viewed
  * pages") from a (basket, item) incidence table. The graph-CONSTRUCTION
  * step feeding this engine's graph family ([[Components]], [[PageRank]],
  * [[Triangles]]): market-basket co-counts are the classic edge weight,
  * and co-citation/co-occurrence graphs are how a training corpus gets a
  * link structure when it has no explicit one.
  *
  * The scale hazard is quadratic per-basket fan-out: a basket of k items
  * emits k(k−1)/2 pairs, so one hub basket (a "the"-grade token list, a
  * crawl index page) dominates the whole job — deg² of the hottest key.
  * `maxBasketSize` is therefore part of the SEMANTICS, not a tuning
  * knob: baskets above the cap are dropped whole (standard practice —
  * an item co-occurring with everything carries no signal), the gate's
  * oracle applies the identical cap, and the bound
  * Σ min(deg, cap)² ≤ cap · |incidence| makes the shuffle linear in the
  * input for any fixed cap.
  *
  * Plan shape: distinct incidence → basket-size filter → one self
  * equi-join on the basket key → pair count. All integers; the oracle
  * replays it verbatim.
  */
object CoOccurrence {

  /** Weighted co-occurrence edges (item_a < item_b, shared ≥ `minShared`)
    * over baskets of at most `maxBasketSize` distinct items.
    */
  def project(df: DataFrame, basketCol: String, itemCol: String,
              minShared: Long = 2L, maxBasketSize: Int = 32): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val bs = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    val sizes = bs.groupBy(col("b")).agg(count(lit(1)).as("bd"))
    // materialized once: both join sides read the SAME filtered incidence
    val kept = bs.join(sizes.filter(col("bd") <= maxBasketSize), "b")
      .select(col("b"), col("i"))
      .localCheckpoint(true)
    kept.select(col("b"), col("i").as("item_a"))
      .join(kept.select(col("b"), col("i").as("item_b")), "b")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
