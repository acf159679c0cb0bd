package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by degree-ordered edge orientation (Schank &
  * Wagner 2005; the MapReduce formulation of Suri & Vassilvitskii 2011)
  * — subgraph counting, the third member of the graph family beside
  * [[Components]] (membership) and [[PageRank]] (importance). Per-node
  * triangle counts are the numerator of the local clustering
  * coefficient — the standard cohesion/spam signal on co-occurrence and
  * link graphs.
  *
  * Why orientation: the naive wedge join (neighbors × neighbors per
  * node) is Σ deg² — one hub node dominates everything. Orienting every
  * undirected edge from its lower-(degree, id) endpoint to its higher
  * one makes each triangle countable EXACTLY ONCE (at its
  * lowest-ordered corner) and bounds every node's OUT-degree by
  * O(√m) on any graph — the classic arboricity argument — so the wedge
  * join's fan-out is Σ outdeg² = O(m^1.5) regardless of hubs. A
  * celebrity with 10⁶ neighbors contributes wedges only through the
  * (few) neighbors ordered above it, not its own deg².
  *
  * Plan shape: three equi-joins and a groupBy — degree attach, wedge
  * self-join on the apex, closure probe against the oriented edge list
  * — with the oriented frame materialized once. All-integer and
  * deterministic (ties in degree break by node id, a total order), so
  * the gate replays it relationally.
  */
object Triangles {

  /** Per-node triangle participation counts: (node, triangles BIGINT)
    * for every node in at least one triangle. Input edges are treated
    * as UNDIRECTED (normalized, deduped; self-loops dropped).
    */
  def triangleCounts(edges: DataFrame, aCol: String = "item_a",
                     bCol: String = "item_b"): DataFrame = {
    val e = edges.select(least(col(aCol), col(bCol)).as("x"),
        greatest(col(aCol), col(bCol)).as("y"))
      .filter(col("x") =!= col("y"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(col("x").as("n")).union(e.select(col("y").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("n").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("n").as("y"), col("d").as("dy")), "y")
    val xFirst = col("dx") < col("dy") ||
      (col("dx") === col("dy") && col("x") < col("y"))
    // oriented low→high by (degree, id); dst degree rides along so the
    // wedge ordering below needs no further join
    val oriented = withDeg.select(
        when(xFirst, col("x")).otherwise(col("y")).as("s"),
        when(xFirst, col("y")).otherwise(col("x")).as("t"),
        when(xFirst, col("dy")).otherwise(col("dx")).as("dt"))
      .localCheckpoint(true)
    val wedges = oriented.select(col("s"), col("t").as("v"), col("dt").as("dv"))
      .join(oriented.select(col("s"), col("t").as("w"), col("dt").as("dw")), "s")
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("s").as("u"), col("v"), col("w"))
    // the closure edge {v, w} is oriented v→w by the SAME total order the
    // wedge filter imposed, so one equi-join closes the triangle
    val tri = wedges.join(oriented.select(col("s").as("v"), col("t").as("w")),
        Seq("v", "w"))
      .localCheckpoint(true)
    tri.select(col("u").as("node"))
      .union(tri.select(col("v").as("node")))
      .union(tri.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }
}
