package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding corpus (SemDeDup, Abbas et al.
  * 2023, arXiv:2303.09540): cluster the embeddings with k-means, then search
  * for high-cosine pairs ONLY inside each cluster — the candidate set drops
  * from n²/2 to Σ|cluster|²/2 ≈ n²/(2k), and the per-cluster work spreads
  * across the cluster-id shuffle instead of a driver-broadcast product.
  *
  * This is the scale answer for semantic (high-threshold) duplicate removal
  * that `SimilarityJoin.allPairsCosine` deliberately is not: the tiled join
  * is exact at ANY threshold but does Θ(n²) work; SemDeDup trades recall for
  * a k-fold work cut, and the misses are exactly the pairs that straddle a
  * cluster boundary — acceptable for near-duplicate pruning (the paper
  * dedups LAION/C4 this way), unacceptable for an exact low-threshold
  * report. Both operators ship; the query layer declares which contract a
  * result set carries.
  *
  * Scale shape at 100 TB: the k-means build is `AnnIndex.kmeansCentroids`
  * (broadcast k×dim centroids, posexplode partial-aggregated means — no
  * cluster ever collects into one task); the pair search is ONE equality
  * self-join on the cluster label (alias self-join → ReuseExchange computes
  * the assignment once). Pick k ≈ n / (desired cluster size); the per-task
  * work is |cluster|² which the label shuffle distributes. A degenerate
  * corpus (one semantic mode) concentrates labels — cap via more clusters,
  * not bucket drops: unlike LSH buckets, every cluster is a REQUIRED part
  * of the answer.
  */
object SemDedup {

  /** Within-cluster cosine pairs at `threshold`, with the final cluster
    * label attached: (label, id_a, id_b, sim), id_a < id_b, sim unrounded.
    *
    * Deterministic end to end: strided k-means init, cosine argmax
    * assignment with ascending-label tiebreak (`AnnIndex.kmeansAssign`),
    * exact cosine verification — replayable in SQL for the oracle gate.
    */
  def clusterPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int, threshold: Double): DataFrame = {
    val cents = AnnIndex.kmeansCentroids(embeddings, idCol, vecCol, k, iters)
    val labeled = AnnIndex.kmeansAssign(embeddings, idCol, vecCol, cents)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("label"))
      // the assignment subtree re-runs the broadcast-join argmax on each
      // side of the self-join unless truncated; checkpoint = assign once
      .localCheckpoint(true)
    labeled.alias("a")
      .join(labeled.alias("b"), col("a.label") === col("b.label"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.label").as("label"),
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        VectorMath.cosine(col("a.v"), col("b.v")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** The discard list SemDeDup actually feeds the pipeline: for every
    * above-threshold within-cluster pair keep the LOWER id, so a row is
    * discarded iff it has any lower-id in-cluster neighbor at ≥ threshold.
    * Output: (vec_id, label, max_sim) per discarded row.
    */
  def discards(embeddings: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, threshold: Double): DataFrame =
    clusterPairs(embeddings, idCol, vecCol, k, iters, threshold)
      .groupBy(col("id_b").as("vec_id"))
      .agg(first(col("label")).as("label"), max(col("sim")).as("max_sim"))

  /** Cluster-stratified DIVERSITY sampling (coreset selection): pick
    * ~`budget` points spread across the embedding space rather than
    * i.i.d. — the training-data curation draw that keeps rare semantic
    * modes ("select 1M diverse documents from 1B"), where a uniform
    * sample would near-drop small clusters entirely. Approximates
    * facility-location/k-center coverage the way SemDeDup approximates
    * the pair scan: cluster with the same deterministic k-means, then
    * give every cluster quota max(1, ⌊budget·|c|/n⌋) — the `max(1, ·)`
    * IS the coverage guarantee (every discovered mode contributes at
    * least one exemplar; ≤ k over budget in the worst case).
    *
    * Within-cluster selection is the md5-uniform order (the
    * [[Curation]] sampling discipline — deterministic across engines,
    * runs and partition layouts) executed through the bounded struct
    * heap: ≤ budget (score, id) structs per cluster per map task
    * through the shuffle, never a per-cluster data sort — windowless,
    * like `weightedSample`. Everything (centroids, assignment, quotas,
    * draw) replays in SQL, so the whole selection sits under the gate.
    *
    * Scale: one broadcast-assign pass over the corpus + a sketch-sized
    * quota frame + the heap aggregate. Budgets large enough that a
    * per-task heap of `budget` structs hurts (≫10⁵) should switch the
    * selection to a per-label window rank — same rows, the oracle
    * states that form already.
    */
  def diversitySample(embeddings: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int, budget: Int,
                      salt: String): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    import graft.functions.TopK.topk_structs
    val cents = AnnIndex.kmeansCentroids(embeddings, idCol, vecCol, k, iters)
    val labeled = AnnIndex.kmeansAssign(embeddings, idCol, vecCol, cents)
      .select(col(idCol).as("id"), col("label"))
      .localCheckpoint(true)
    val total = labeled.agg(count(lit(1)).as("n"))
    val quota = labeled.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_n"))
      .crossJoin(broadcast(total))
      .select(col("label"), col("cluster_n"),
        greatest(lit(1L), call_function("div",
          lit(budget.toLong) * col("cluster_n"), col("n"))).as("quota"))
    // the Curation md5-52-bit uniform: deterministic, engine-identical
    val u = conv(substring(md5(concat(lit(salt), col("id").cast("string"))),
      1, 13), 16, 10).cast("long")
    // score −u orders ascending-u exactly (u < 2^52 is double-exact);
    // equal-u ties break on the payload id ascending — so the heap's
    // emit order IS the (u, id) order the oracle's window states
    val drawn = labeled.withColumn("u", u)
      .groupBy(col("label"))
      .agg(topk_structs(-col("u").cast("double"), col("id"), budget)
        .as("_top"))
      .select(col("label"), posexplode(col("_top.payload")))
      .select(col("label"), (col("pos") + 1).cast("long").as("rnk"),
        col("col").as("id"))
    drawn.join(broadcast(quota), "label")
      .filter(col("rnk") <= col("quota"))
      .select(col("label"), col("id"), col("rnk"), col("cluster_n"),
        col("quota"))
  }
}
