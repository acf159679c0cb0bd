package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact all-pairs similarity as a block-tiled equality self-join — the
  * scale path for the `emb_top_pairs` / `emb_dedup_cos` queries
  * (reference surface: exhaustive pairwise similarity over an embedding
  * corpus; cf. `/root/reference/docs/system-design.md` analytics tier).
  *
  * Why tiling, not LSH candidates, for the EXACT low-threshold query:
  * these queries are exact (DuckDB-oracle-checked) at cosine ≥ 0.45.
  * Random-hyperplane LSH has per-bit collision probability
  * p = 1 − acos(s)/π ≈ 0.65 at s = 0.45, so with b-bit tables the
  * per-table hit rate is 0.65^b and the miss probability after L tables
  * is (1 − 0.65^b)^L. Hitting recall ~1 at the threshold needs L in the
  * hundreds — and at that L essentially every background pair at
  * s ∈ [0.3, 0.45) (the measured corpus has ~1000 of them vs 14 true
  * pairs at sf0.01) collides too, so the "candidate" set degenerates to
  * ~all n² pairs. LSH amplification separates high-sim pairs (s ≥ 0.8,
  * the near-duplicate regime — see `AnnIndex.lshTopK` and
  * `TextDedup`) from noise; it cannot cheaply separate 63° from 72°.
  * Exact thresholding this low is inherently Θ(n²) WORK — the scale
  * problem to solve is DISTRIBUTION, not work: the naive `id_a < id_b`
  * non-equi self-join plans as a BroadcastNestedLoopJoin (driver
  * broadcast of a whole side, one task per left partition — dies at
  * 100×), while the tiled form below is an equality join that shuffles
  * evenly, holds one tile in memory at a time, and scales out linearly
  * with executors.
  *
  * Construction: block each vector by `g = id mod B`; an unordered block
  * pair (i ≤ j) is one TILE. The left side replicates each vector to
  * tiles (g, j) for j ≥ g via `sequence(g, B−1)`, the right side to
  * tiles (i, g) for i ≤ g — an equality join on (ti, tj) then meets
  * exactly the vectors of each tile. Every unordered vector pair occurs
  * in exactly one tile; within the diagonal tiles (i = i) both
  * orientations appear, so the pair filter is `ti < tj OR id_a < id_b`.
  * Each side is replicated ≤ B times (average (B+1)/2) — shuffle volume
  * is O(n·B) while the join work n²/2 spreads uniformly over B(B+1)/2
  * tiles (block ids are uniform for any id distribution when salted by
  * hash; plain mod suffices for dense sequential ids). Pick
  * B ≈ sqrt(2 × target tasks): B = 8 → 36 tiles ≳ 32 cores locally; a
  * 1000-executor cluster would run B ≈ 64 → 2080 tiles, each tile's
  * build side n/64 vectors.
  */
object SimilarityJoin {

  /** All unordered pairs (id_a < id_b) with exact cosine similarity, as a
    * tiled equality self-join. Output: (id_a, id_b, sim) with `sim` the
    * raw double (callers round/filter/rank). Norms are computed once per
    * vector BEFORE tile replication (n·B sqrt folds, not n² per pair) with
    * the same `sqrt(vec_dot(v,v))` expression as the brute-force form, so
    * results are bit-identical to the naive join.
    */
  def allPairsCosine(embeddings: DataFrame, idCol: String, vecCol: String,
                     blocks: Int = 8): DataFrame = {
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    import graft.functions.VecDot.vec_dot
    val g = pmod(col(idCol), lit(blocks)).cast("int")
    val sided = embeddings.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(vec_dot(col(vecCol), col(vecCol))).as("nrm"), g.as("g"))
    val left = sided
      .select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"),
        col("g").as("ti"), explode(sequence(col("g"), lit(blocks - 1))).as("tj"))
    val right = sided
      .select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"),
        explode(sequence(lit(0), col("g"))).as("ti"), col("g").as("tj"))
    left.join(right, Seq("ti", "tj"))
      .filter(col("ti") < col("tj") || col("id_a") < col("id_b"))
      // cross-block tiles meet pairs in block order, not id order — emit
      // the unordered pair as (lesser, greater); sim is symmetric
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        (vec_dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
  }
}
