package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI'11) — the memory-side of the FAISS-style ANN
  * triad next to `AnnIndex` (LSH/IVF) and `Quantize` (SQ8):
  *
  *   - split each d-dim vector into `m` subvectors of d/m dims;
  *   - train an independent k-centroid codebook per subspace
  *     (deterministic Lloyd iterations, strided init — same replayable
  *     recipe as `AnnIndex.kmeansCentroids`);
  *   - encode every vector as `m` small codes (k=8 → 3 bits/subspace:
  *     a 64-dim float vector becomes 4 codes — 64× smaller);
  *   - search with ASYMMETRIC DISTANCE COMPUTATION: the query builds an
  *     m×k lookup table of subspace dot products once, and each encoded
  *     vector's score is m table lookups + adds — no float vectors are
  *     ever read at query time.
  *
  * Scale shape: training aggregates per (subspace, centroid, dim) — no
  * cluster ever gathers into one task; encode and ADC are broadcast joins
  * against codebook/LUT tables of m×k rows; the only shuffle is the
  * per-vector score regroup, keyed by vec_id (uniform).
  *
  * Everything is deterministic (ties break by centroid label), so the
  * whole build+encode+search replays in SQL — `knn_pq_adc` in
  * graft.queries.Curation gates it against DuckDB end to end.
  */
object Pq {

  /** (vec_id, m, sv): the m subvectors of each embedding, doubles. */
  def subvectors(emb: DataFrame, idCol: String, vecCol: String,
                 m: Int, dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val subDim = dim / m
    emb.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .select(col("vec_id"), inline(array((0 until m).map { i =>
        struct(lit(i).as("m"), slice(col("v"), lit(i * subDim + 1), lit(subDim)).as("sv"))
      }: _*)))
  }

  /** Squared L2 via dot products — written EXACTLY as the oracle computes
    * it (a − 2b + c over sequential-accumulation dots) so assignment
    * argmins match bit-for-bit across engines.
    */
  private def d2(sv: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) = {
    import graft.functions.VecDot.vec_dot
    vec_dot(sv, sv) - lit(2.0) * vec_dot(sv, c) + vec_dot(c, c)
  }

  /** Per-subspace codebooks: (m, label, centroid). Strided init over dense
    * 0-based ids (fails loudly otherwise), `iters` Lloyd refinements with
    * per-(m, label, dim) partial-aggregated means.
    */
  def trainCodebooks(sub: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 0, s"need k >= 1 and iters >= 0")
    val n = sub.select(col("vec_id")).distinct().count()
    require(n >= k, s"k=$k exceeds corpus size $n")
    val stride = math.max(n / k, 1)
    var books = sub
      .filter(pmod(col("vec_id"), lit(stride)) === 0 && col("vec_id") < stride * k)
      .select(col("m"), (col("vec_id") / stride).cast("int").as("label"),
        col("sv").as("centroid"))
      .localCheckpoint(true)
    val m = books.select(countDistinct(col("m"))).first().getLong(0)
    require(books.count() == k * m,
      s"strided init found ${books.count() / math.max(m, 1)} of $k seeds per " +
        s"subspace — trainCodebooks needs dense 0-based vec_ids")
    for (_ <- 1 to iters) {
      books = encode(sub, books)
        .select(col("m"), col("code").as("label"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("label"), col("pos"))
        .agg(avg(col("x")).as("mu"))
        .groupBy(col("m"), col("label"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("mu")))),
          e => e.getField("mu")).as("centroid"))
        .localCheckpoint(true)
    }
    books
  }

  /** Nearest codebook entry per (vector, subspace): (vec_id, m, code, sv).
    * Broadcast m×k codebook join; argmin ties break by label.
    */
  def encode(sub: DataFrame, books: DataFrame): DataFrame = {
    val b = books.select(col("m"), col("label").as("_pq_label"),
      col("centroid").as("_pq_centroid"))
    sub.join(broadcast(b), Seq("m"))
      .withColumn("_d2", d2(col("sv"), col("_pq_centroid")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("_pq_label"), struct(col("_d2"), col("_pq_label"))).as("code"),
        first(col("sv")).as("sv"))
  }

  /** Score encoded vectors against the query's m×k dot-product LUT and
    * keep the top k by (score desc, vec_id). One sum per subspace, then a
    * FIXED-ORDER add — a plain sum() over the m scores would accumulate in
    * partial-aggregation order and wobble in the last ulp across runs.
    */
  private def adcRank(codes: DataFrame, books: DataFrame, qsub: DataFrame,
                      m: Int, k: Int): DataFrame = {
    import graft.functions.VecDot.vec_dot
    val lut = books.join(broadcast(qsub), Seq("m"))
      .select(col("m"), col("label").as("code"),
        vec_dot(col("qsv"), col("centroid")).as("score"))
    val perSub = (0 until m).map(i =>
      sum(when(col("m") === i, col("score"))).as(s"_s$i"))
    codes.join(broadcast(lut), Seq("m", "code"))
      .groupBy(col("vec_id"))
      .agg(perSub.head, perSub.tail: _*)
      .select(col("vec_id"),
        round((0 until m).map(i => col(s"_s$i")).reduce(_ + _), 6).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(k)
  }

  /** ADC top-k for an in-corpus query vector: train, encode everything but
    * the query, score via the query's m×k dot-product LUT, keep the top k
    * by (score desc, vec_id). Returns (vec_id, adc).
    */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
              k: Int = 10, m: Int = 4, kCent: Int = 8, iters: Int = 1,
              dim: Int = 64): DataFrame = {
    // one subvector materialization feeds every training round, the final
    // encode and the query side — without it each Lloyd job re-reads and
    // re-slices the source (iters+3 scans; measured ~2x on the bench query)
    val sub = subvectors(emb, idCol, vecCol, m, dim).localCheckpoint(true)
    val books = trainCodebooks(sub, kCent, iters)
    val codes = encode(sub.filter(col("vec_id") =!= queryId), books)
      .select(col("vec_id"), col("m"), col("code"))
    val qsub = sub.filter(col("vec_id") === queryId)
      .select(col("m"), col("sv").as("qsv"))
    adcRank(codes, books, qsub, m, k)
  }

  /** IVF-PQ: coarse inverted-file pruning (probe the `nprobe` label
    * partitions nearest the query by centroid cosine, exactly as
    * `AnnIndex.ivfTopK`) + PQ/ADC scoring INSIDE the probed partitions —
    * the FAISS IVFADC search shape. Candidate volume drops by
    * nprobe/nlabels before any scoring happens, and scoring touches codes
    * only, never float vectors.
    *
    * Non-residual variant: codes quantize raw vectors, not coarse
    * residuals (residual encoding refines accuracy but needs per-probe
    * LUTs; this keeps one global LUT per query — a documented tradeoff,
    * not an omission).
    */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                labelCol: String, queryId: Long, k: Int = 10,
                nprobe: Int = 3, m: Int = 4, kCent: Int = 8, iters: Int = 1,
                dim: Int = 64): DataFrame = {
    val cents = AnnIndex.centroids(emb, labelCol, vecCol)
    val qv = emb.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    val probed = cents.join(broadcast(qv))
      .select(col("label"),
        VectorMath.cosine(col("centroid"), col("qv")).as("csim"))
      .orderBy(col("csim").desc, col("label")) // label tiebreak: deterministic
      .limit(nprobe)
      .select("label")
    val sub = subvectors(emb, idCol, vecCol, m, dim).localCheckpoint(true)
    val books = trainCodebooks(sub, kCent, iters) // global codebooks, full corpus
    val probedIds = emb
      .join(broadcast(probed), emb(labelCol) === probed("label"))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol).as("vec_id"))
    val codes = encode(sub.join(probedIds, Seq("vec_id")), books)
      .select(col("vec_id"), col("m"), col("code"))
    val qsub = sub.filter(col("vec_id") === queryId)
      .select(col("m"), col("sv").as("qsv"))
    adcRank(codes, books, qsub, m, k)
  }
}
