package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based near-duplicate detection for document corpora — the
  * training-data-pipeline operators (builder brief): word-shingling,
  * MinHash signatures, banded LSH candidate generation, exact n-gram
  * Jaccard verification, and SimHash.
  *
  * Scale design: candidate pairs are generated ONLY inside LSH buckets
  * (band-hash equality joins) — never an all-pairs product. Every stage is
  * native Catalyst expressions (no UDFs), so the whole sketch computation
  * stays inside whole-stage codegen; the only shuffles are the bucket join
  * keys, which are uniform hashes (no planned skew). Oversized buckets
  * (degenerate content, e.g. the empty shingle set) are capped by
  * `maxBucketSize` so one pathological key cannot produce a quadratic
  * task at 100 TB.
  */
object TextDedup {

  /** Word n-gram shingles of a text column, de-duplicated (set semantics). */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(text, " ")
    // guard: sequence(0, k) with k<0 would generate a DESCENDING range
    when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** 64-bit hashes of the shingle set (cheap to re-hash per MinHash fn). */
  def shingleHashes(shinglesCol: Column): Column =
    transform(shinglesCol, s => xxhash64(s))

  /** Distinct shingle hashes straight from the text — the codegen fast path
    * (graft.functions.ShingleHashExpr), bit-identical to
    * `shingleHashes(shingles(text, n))`. All candidate generation and
    * hash-set Jaccard verification below run on this: set operations on
    * longs, with the shingle strings never materialized.
    */
  def shingleHashSet(text: Column, n: Int = 3): Column =
    graft.functions.ShingleHash.shingle_hashes(text, n)

  /** MinHash signature: element i = min over shingles of an independent
    * hash function, realized as xxhash64(shingleHash, i) — no coefficient
    * tables. Implemented as the codegen MinHashSigExpr (bit-identical to
    * the HOF formulation, which runs interpreted and boxes every element).
    */
  def minhashSignature(hashes: Column, numHashes: Int = 64): Column =
    graft.functions.MinHashSig.minhash_signature(hashes, numHashes)

  /** Banded LSH keys: `bands` hashes, each over `rows` consecutive
    * signature entries. Two docs sharing any band key are candidates.
    */
  def bandKeys(signature: Column, bands: Int = 16, rows: Int = 4): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => struct(
        j.as("band"),
        xxhash64(slice(signature, j * rows + 1, lit(rows)), j).as("bucket")))

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** docs(idCol, textCol) → candidate pairs (id_a < id_b) from banded
    * MinHash-LSH, with the exact shingle-Jaccard attached. One shuffle on
    * the band keys; buckets larger than `maxBucketSize` are dropped (they
    * indicate degenerate content, and any true near-dup inside them is
    * still found via its other, less-degenerate bands).
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, numHashes: Int = 64,
                     bands: Int = 16, rows: Int = 4,
                     maxBucketSize: Int = 1000): DataFrame = {
    require(bands * rows <= numHashes, "bands*rows must fit the signature")
    val sketch = docs
      .select(col(idCol).as("doc_id"), shingleHashSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("doc_id"), col("sh"),
        explode(bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("doc_id"), col("sh"),
        col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    // bucket-size cap via a window count — one pass over the sketch, no
    // extra join recomputing the signatures
    val inBuckets = sketch
      .withColumn("_bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("_bsz") <= maxBucketSize && col("_bsz") > 1)
      .drop("_bsz")
    val a = inBuckets.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = inBuckets.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .groupBy("id_a", "id_b") // same pair may collide in several bands
      .agg(first(col("jaccard")).as("jaccard"))
  }

  /** Verified near-duplicate pairs: candidates whose exact shingle Jaccard
    * meets `threshold`.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.8, n: Int = 3): DataFrame =
    candidatePairs(docs, idCol, textCol, n)
      .filter(col("jaccard") >= threshold)

  /** Exact n-gram-Jaccard near-dup via a PREFIX-FILTERED inverted index
    * (AllPairs/PPJoin family, Bayardo et al. WWW'07) — the sketch-free
    * third strategy. Complete, not approximate:
    *
    * Order each doc's shingle hashes ascending (any global total order
    * works) and index only the first `|A| - ceil(t*|A|) + 1` of them. If
    * J(A,B) >= t then |A∩B| >= t*max(|A|,|B|), so the smallest shared
    * hash w has rank <= |A| - |A∩B| + 1 <= prefixLen in BOTH docs — the
    * equality join on w finds every qualifying pair. At t=0.8 the index
    * holds ~20% of the shingles and candidate fan-out drops ~25x vs a full
    * inverted index; the join shuffles only (hash, id, size), never arrays.
    *
    * A length filter (min size >= ceil(t * max size)) prunes candidates
    * before dedup, and shingles with df > `maxDF` within the prefix index
    * are dropped (boilerplate guard — affects only candidate recall on
    * degenerate corpora, never precision). Verification recomputes the
    * exact Jaccard from the full sets.
    */
  def jaccardNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                            threshold: Double = 0.8, n: Int = 3,
                            maxDF: Int = 1000): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), shingleHashSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))
    val prefLen = (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")
    val inv = sh
      .select(col("doc_id"), col("sz"),
        explode(slice(sort_array(col("sh")), lit(1), prefLen)).as("h"))
      .withColumn("_df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("_df") <= maxDF)
      .drop("_df")
    val cand = inv.select(col("h"), col("doc_id").as("id_a"), col("sz").as("sz_a"))
      .join(inv.select(col("h"), col("doc_id").as("id_b"), col("sz").as("sz_b")), Seq("h"))
      .filter(col("id_a") < col("id_b") &&
        least(col("sz_a"), col("sz_b")) >=
          ceil(greatest(col("sz_a"), col("sz_b")) * threshold))
      .select("id_a", "id_b").distinct()
    cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash-bucketed near-dup with exact Jaccard verification: candidates
    * from the pigeonhole segment join (Hamming ≤ `maxDistance`), output
    * filtered on the exact shingle Jaccard — so the result is identical to
    * the brute-force J ≥ threshold answer whenever every true pair sits
    * within `maxDistance` (observed ≤ 10 at J ≥ 0.9 on 64-bit fingerprints;
    * the default 12 adds margin).
    */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                            threshold: Double = 0.8, maxDistance: Int = 12,
                            pieces: Int = 13, n: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), shingleHashSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    SimHash.nearDuplicates(docs, idCol, textCol, maxDistance, pieces, n)
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}

/** 64-bit SimHash over the shingle hash set, with banded near-dup search:
  * split the fingerprint into `pieces` segments — any pair at Hamming
  * distance ≤ pieces-1 shares at least one exact segment (pigeonhole), so
  * the candidate join is again equality-bucketed, never all-pairs.
  */
object SimHash {

  /** SimHash fingerprint of an array<long> of shingle hashes: sign of the
    * per-bit vote sum. Codegen expression (graft.functions.SimHash64Expr);
    * `simhash64Reference` below keeps the HOF formulation as the equality
    * oracle for it.
    */
  def simhash64(hashes: Column): Column =
    graft.functions.SimHash64.simhash64(hashes)

  /** Reference HOF formulation (interpreted, |hashes|×64 boxed lambda calls
    * per row — kept only to pin the codegen expression's semantics in tests).
    */
  def simhash64Reference(hashes: Column): Column = {
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, sequence(lit(0L), lit(63L)),
        (a, bit) => a + when(
          call_function("shiftright", h, bit).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0L), lit(63L)),
        (v, bit) => when(v > 0, call_function("shiftleft", lit(1L), bit))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** docs(idCol, textCol) → pairs with Hamming(simhash) ≤ maxDistance.
    * `pieces` must be > maxDistance for pigeonhole completeness.
    *
    * Segments cover ALL 64 bits with near-equal widths (⌈64/pieces⌉ then
    * ⌊64/pieces⌋): wider segments mean exponentially more buckets per
    * piece, which is what bounds candidate fan-out — at 13 pieces this is
    * 12 five-bit + 1 four-bit segments (32-value buckets) instead of
    * uniform four-bit ones, halving bucket collisions.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     maxDistance: Int = 3, pieces: Int = 4,
                     shingleN: Int = 3): DataFrame = {
    require(pieces > maxDistance, "need pieces > maxDistance for full recall")
    require(pieces <= 64, "at most one segment per bit")
    val wide = 64 % pieces       // this many segments get an extra bit
    val base = 64 / pieces
    val widths = Seq.tabulate(pieces)(p => if (p < wide) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    val fp = docs
      .select(col(idCol).as("doc_id"),
        TextDedup.shingleHashSet(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("fp", simhash64(col("sh")))
      .select(col("doc_id"), col("fp"),
        explode(array(Seq.tabulate(pieces) { p =>
          struct(lit(p).as("piece"),
            call_function("shiftright", col("fp"), lit(offsets(p)))
              .bitwiseAND(lit((1L << widths(p)) - 1)).as("seg"))
        }: _*)).as("pk"))
      .select(col("doc_id"), col("fp"),
        col("pk.piece").as("piece"), col("pk.seg").as("seg"))
    val a = fp.select(col("piece"), col("seg"), col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = fp.select(col("piece"), col("seg"), col("doc_id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("piece", "seg"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("fp_a"), col("fp_b")).as("distance"))
      .filter(col("distance") <= maxDistance)
      .distinct()
  }
}
