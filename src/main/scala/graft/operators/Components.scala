package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * after near-duplicate PAIR detection: pairs (a,b),(b,c) must collapse to
  * one keep-group {a,b,c} before a corpus can drop duplicates (the
  * reference surface's dedup endpoint; every 100 TB dedup pipeline ends
  * here).
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * adopts the minimum label among itself and its neighbors — one
  * edge-to-label equality join + groupBy-min per round, converging in
  * O(graph diameter) rounds. Near-dup clusters are dense and tiny
  * (diameter ≤ a few hops), so 3-5 rounds close them; the driver checks a
  * convergence count per round (one action, same discipline as GraphX's
  * connectedComponents Pregel loop) and `maxIter` bounds pathological
  * chains. All state lives in (node, label) DataFrames partitioned by the
  * join keys — no driver-side graph, no per-node collect.
  */
object Components {

  /** (id, component) for every node appearing in `edges`, where component
    * is the cluster's minimum node id. Columns `idA`/`idB` name the edge
    * endpoints in `edges`.
    */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
                          idB: String = "id_b",
                          maxIter: Int = 20): DataFrame = {
    // undirected: propagate along both orientations. Materialized ONCE —
    // the loop touches the edge list 2×/iteration, and `edges` is usually
    // an expensive plan (the whole near-dup candidate pipeline)
    val e = edges.select(col(idA).as("u"), col(idB).as("v"))
      .union(edges.select(col(idB).as("u"), col(idA).as("v")))
      .distinct()
      .localCheckpoint(true)
    var labels = e.select(col("u").as("id")).distinct()
      .withColumn("lbl", col("id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // candidate labels flowing along edges: neighbor's label reaches me
      val viaEdges = e.join(labels, e("v") === labels("id"))
        .select(e("u").as("id"), labels("lbl").as("lbl"))
      // localCheckpoint, not persist: an iterative DataFrame loop grows
      // its lineage every round and replanning (and even the plan STRING)
      // eventually dominates or OOMs — truncate it each iteration, the
      // same discipline as GraphX's Pregel materialization
      val next = labels.select(col("id"), col("lbl"))
        .union(viaEdges)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), "id")
        .filter(col("lbl") =!= col("old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    // silent non-convergence would split true clusters and let duplicates
    // through the keep-one-per-group step — refuse instead
    require(converged,
      s"connectedComponents did not converge within $maxIter iterations " +
        "(graph diameter exceeds maxIter) — raise maxIter")
    labels.select(col("id"), col("lbl").as("component"))
  }
}
