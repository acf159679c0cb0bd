package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (LPA, Raghavan et
  * al. 2007) — the clustering member of the graph family beside
  * `Components` (connectivity), `PageRank` (centrality) and `Triangles`
  * (cohesion): components answers "which nodes CAN reach each other",
  * LPA answers "which nodes talk to each other MORE than to the rest" —
  * product families in a co-purchase graph, topic clusters in a citation
  * graph — without choosing k or a distance metric.
  *
  * Determinism discipline (the PageRank/fixed-point contract): node
  * labels start as the node ids; each SYNCHRONOUS round every node takes
  * the most frequent label among its in-neighbors, ties broken toward
  * the SMALLEST label, nodes with no in-edges keeping their label.
  * Votes are exact BIGINT counts and the winner is an integer argmax —
  * `max(struct(cnt, -label))` — so every round is bit-identical under
  * any partition layout and the whole run unrolls into SQL for the
  * oracle (`q26_communities` replays two rounds with window row_number).
  * Synchronous + deterministic ties trades convergence speed for
  * replayability — the classic async random-order LPA cannot be gated.
  *
  * Caller symmetrizes for undirected semantics (every edge both ways,
  * the `q16_pagerank` idiom). Plan per round: one equi-join of edges
  * against the (node, label) frame on src, one map-side-combined count
  * on (dst, label), one argmax groupBy on dst, one left join back to the
  * node set — all shuffles on node ids (uniform at any scale), the edge
  * frame materialized ONCE (`localCheckpoint`) and the label frame
  * checkpointed per round to truncate lineage (the iterative-loop
  * contract). Output is (node, community) — community sizes follow with
  * one count.
  */
object Communities {

  /** Labels after `rounds` synchronous votes over the DIRECTED edge
    * list (src votes into dst). Output: (node BIGINT, community BIGINT)
    * for every node with at least one edge in either direction.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val winners = e.join(labels, e("src") === labels("node"))
        .groupBy(e("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("w"))
        .select(col("node"), (-col("w.nl")).as("_new"))
      labels = nodes
        .join(winners, Seq("node"), "left")
        .join(labels, Seq("node"))
        .select(col("node"), coalesce(col("_new"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    labels.select(col("node"), col("label").as("community"))
  }
}
