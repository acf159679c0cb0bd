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

  /** Keep only index rows in buckets with minSize..cap occupants:
    * sub-minSize buckets cannot produce a pair (minSize 2 for self-joins;
    * 1 for cross-corpus joins, where a singleton index bucket can still
    * meet a delta row), and over-cap buckets are degenerate boilerplate
    * whose quadratic fan-out would dominate a 100 TB run. Implemented as a
    * partial-aggregated count + key join — NOT a window over the full
    * index, which would shuffle every row just to count its bucket.
    */
  private[operators] def keepPairableBuckets(df: DataFrame, keys: Seq[String],
                                             cap: Int,
                                             minSize: Int = 2): DataFrame = {
    val pairable = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") >= minSize && col("_bsz") <= cap)
      .select(keys.map(col): _*)
    df.join(pairable, keys.toSeq)
  }

  /** The banded-LSH index rows for a corpus: one (doc_id, sh, band, bucket)
    * row per band key — the shared build for the self-join (batch dedup)
    * and the cross-corpus join (incremental dedup).
    *
    * This is the PERSISTABLE dedup index: write it once with
    * `.bucketBy(B, "band", "bucket").sortBy("bucket").saveAsTable(...)` and
    * every future delta batch joins it WITHOUT shuffling the corpus side —
    * the bucketed scan already reports the join's hash partitioning, so
    * only the (small) delta pays an exchange. At 100 TB that converts the
    * per-batch cost from "reshuffle the corpus sketch" to "shuffle the
    * batch"; `TextDedupSpec` asserts the exchange-free plan.
    */
  def bandedIndex(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                  rows: Int = 4): DataFrame = {
    require(bands * rows <= numHashes, "bands*rows must fit the signature")
    bandedSketch(docs, idCol, textCol, n, numHashes, bands, rows)
  }

  /** The (doc_id, sh, sig) sketch frame every LSH shape starts from —
    * lazy; callers that consume it more than once checkpoint it.
    */
  private def sketchOf(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, numHashes: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), shingleHashSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

  /** Band rows (doc_id, sh, band, bucket) from a prebuilt sketch frame. */
  private def bandRowsOf(sk: DataFrame, bands: Int, rows: Int): DataFrame =
    sk.select(col("doc_id"), col("sh"),
        explode(bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("doc_id"), col("sh"),
        col("bk.band").as("band"), col("bk.bucket").as("bucket"))

  private def bandedSketch(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, numHashes: Int, bands: Int,
                           rows: Int): DataFrame =
    bandRowsOf(sketchOf(docs, idCol, textCol, n, numHashes), bands, rows)

  /** docs(idCol, textCol) → candidate pairs (id_a < id_b) from banded
    * MinHash-LSH, with the exact shingle-Jaccard attached. One shuffle on
    * the band keys; buckets larger than `maxBucketSize` are dropped (they
    * indicate degenerate content, and any true near-dup inside them is
    * still found via its other, less-degenerate bands).
    *
    * CONTRACT (ADVICE r15): `idCol` must be unique per document. A corpus
    * with duplicate doc_ids would emit multiple rows per (id_a, id_b)
    * pair with per-copy jaccard values — the caller owns id hygiene
    * (every declared pipeline feeds primary-keyed doc frames).
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, numHashes: Int = 64,
                     bands: Int = 16, rows: Int = 4,
                     maxBucketSize: Int = 1000): DataFrame = {
    require(bands * rows <= numHashes, "bands*rows must fit the signature")
    // Round-15 reshape (guide §8 — decide with small rows, attach the
    // payload once): the old shape carried each doc's FULL shingle-hash
    // array through the band self-join — `bands` copies of the heaviest
    // column through the exchange — and recomputed the exact Jaccard
    // once per band COLLISION (a true near-dup pair collides in most of
    // its bands, so the array_intersect ran ~bands× per pair). Now the
    // sketch materializes once, the self-join moves only
    // (doc_id, band, bucket) rows, pairs dedup BEFORE verification, and
    // the Jaccard is computed exactly once per candidate pair from the
    // cached sh arrays. Same pair set, same deterministic jaccard value
    // per pair → bit-identical output (`first` over equal per-collision
    // values ≡ the single computed value). At 100 TB the production
    // delta path stays the persisted bucketed index (`bandedIndex`); this
    // batch form's cache is the corpus sketch it already shuffled before.
    val sk = sketchOf(docs, idCol, textCol, n, numHashes)
      .localCheckpoint(true)
    candidatePairsOfSketch(sk, bands, rows, maxBucketSize)
  }

  /** [[candidatePairs]] over an ALREADY-MATERIALIZED (doc_id, sh, sig)
    * sketch frame — the round-16 seam that lets the dedup gate compute
    * the batch's sketch ONCE and share it across its within-batch half,
    * its cross-index probe and its index write.
    */
  private def candidatePairsOfSketch(sk: DataFrame, bands: Int, rows: Int,
                                     maxBucketSize: Int): DataFrame = {
    val bandRows = sk
      .select(col("doc_id"), explode(bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.bucket").as("bucket"))
    val inBuckets = keepPairableBuckets(bandRows, Seq("band", "bucket"),
      maxBucketSize)
    // alias self-join (NOT renamed projections on each side): both sides
    // are the identical subplan, so ReuseExchange computes the band rows
    // and their shuffle ONCE instead of twice
    val cand = inBuckets.alias("a")
      .join(inBuckets.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct() // same pair may collide in several bands
    cand
      .join(sk.select(col("doc_id"), col("sh")).alias("sa"),
        col("id_a") === col("sa.doc_id"))
      .join(sk.select(col("doc_id"), col("sh")).alias("sb"),
        col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sa.sh"), col("sb.sh")).as("jaccard"))
  }

  /** Verified near-duplicate pairs: candidates whose exact shingle Jaccard
    * meets `threshold`.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.8, n: Int = 3): DataFrame =
    candidatePairs(docs, idCol, textCol, n)
      .filter(col("jaccard") >= threshold)

  /** INCREMENTAL near-dedup — the production delta shape: an arriving
    * batch is checked against the existing corpus without ever re-pairing
    * the corpus with itself. Both sides build the same banded-LSH sketch;
    * the join is incoming-bands → existing-bands on (band, bucket), so the
    * work is |batch| × collision-rate, not |corpus|². At 100 TB the
    * existing sketch is the persisted dedup INDEX (write `bandedSketch`
    * output once, bucketed by (band, bucket)); each delta batch then
    * shuffles only itself against co-bucketed index rows. Existing-side
    * buckets above `maxBucketSize` are dropped, same degenerate-boilerplate
    * guard as the batch form. Output: (new_id, old_id, jaccard ≥ threshold),
    * exact-verified. Within-batch duplicates are `nearDuplicates(incoming)`
    * — compose both for full delta hygiene.
    */
  def incrementalNearDuplicates(existing: DataFrame, incoming: DataFrame,
                                idCol: String, textCol: String,
                                threshold: Double = 0.8, n: Int = 3,
                                numHashes: Int = 64, bands: Int = 16,
                                rows: Int = 4,
                                maxBucketSize: Int = 1000): DataFrame = {
    require(bands * rows <= numHashes, "bands*rows must fit the signature")
    incrementalAgainstIndex(
      bandedSketch(existing, idCol, textCol, n, numHashes, bands, rows),
      incoming, idCol, textCol, threshold, n, numHashes, bands, rows,
      maxBucketSize)
  }

  /** The delta join against an ALREADY-BUILT index (`bandedIndex` output,
    * typically read back from its bucketed table): the corpus side is
    * consumed as-is — no sketch rebuild, and no exchange when the table is
    * bucketed by (band, bucket).
    */
  def incrementalAgainstIndex(index: DataFrame, incoming: DataFrame,
                              idCol: String, textCol: String,
                              threshold: Double = 0.8, n: Int = 3,
                              numHashes: Int = 64, bands: Int = 16,
                              rows: Int = 4,
                              maxBucketSize: Int = 1000): DataFrame = {
    require(bands * rows <= numHashes, "bands*rows must fit the signature")
    incrementalSketchAgainstIndex(index,
      bandRowsOf(sketchOf(incoming, idCol, textCol, n, numHashes),
        bands, rows),
      threshold, maxBucketSize)
  }

  /** The index-probe join over prebuilt delta band rows (doc_id, sh,
    * band, bucket) — the seam the gate uses to feed its ONE shared batch
    * sketch into the cross probe. Plan shape unchanged: the index side
    * is bucketed (exchange-free), only the delta pays an exchange.
    */
  private def incrementalSketchAgainstIndex(index: DataFrame,
                                            delta: DataFrame,
                                            threshold: Double,
                                            maxBucketSize: Int): DataFrame = {
    val cappedIdx = keepPairableBuckets(index, Seq("band", "bucket"),
      maxBucketSize, minSize = 1)
    delta.alias("nw")
      .join(cappedIdx.alias("ex"),
        col("nw.band") === col("ex.band") && col("nw.bucket") === col("ex.bucket"))
      .select(col("nw.doc_id").as("new_id"), col("ex.doc_id").as("old_id"),
        jaccard(col("nw.sh"), col("ex.sh")).as("jaccard"))
      .groupBy(col("new_id"), col("old_id")) // multi-band collisions
      .agg(first(col("jaccard")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** STREAMING dedup gate — the `foreachBatch` body that puts the
    * incremental join in front of a corpus as documents ARRIVE: each
    * micro-batch is checked against the persisted index table
    * `indexTable` AND against itself (within-batch duplicates reject
    * their higher id), duplicate docs are rejected, and the admitted
    * docs' sketch rows are written to the index so later batches dedup
    * against them too. Returns the batch's duplicate pairs
    * (new_id, old_id, jaccard) for the caller to sink; the index write
    * happens before returning (the pair frame is checkpointed first, so
    * the write never invalidates a plan still reading the index).
    *
    * The index is the BUCKETED table discipline of `bandedIndex`, made
    * durable for a long-lived stream:
    *  - bucketed by (band, bucket): the per-batch join shuffles ONLY the
    *    incoming delta — the index side is exchange-free however large
    *    the corpus grows (plan-asserted in `TextDedupSpec`). A plain
    *    parquet index would re-shuffle the ENTIRE accumulated corpus
    *    sketch every micro-batch.
    *  - partitioned by `_batch_id` and written with dynamic partition
    *    OVERWRITE: a crash-replayed batch rewrites exactly its own
    *    partition, so the index CONTENTS are exactly-once (a plain
    *    append would duplicate sketch rows on replay, inflating bucket
    *    occupancy toward `maxBucketSize` until true duplicates are
    *    silently dropped). Replay also EXCLUDES the batch's own
    *    partition from the join (plus the `new_id` ≠ `old_id` belt), so
    *    admitted docs replay as admitted, not as duplicates of
    *    themselves.
    *  - per-batch small files are swept by `compactGateIndex` below.
    *
    * The table is created (bucketed, at `indexPath`) on first use, keyed
    * off the batch's own schema.
    */
  def dedupGateBatch(batch: DataFrame, idCol: String, textCol: String,
                     indexTable: String, indexPath: String, batchId: Long,
                     threshold: Double = 0.8, n: Int = 3,
                     numHashes: Int = 64, bands: Int = 16, rows: Int = 4,
                     maxBucketSize: Int = 1000, buckets: Int = 32): DataFrame = {
    val spark = batch.sparkSession
    BatchTables.ensureBatchTable(
      bandedIndex(batch.limit(0), idCol, textCol, n, numHashes, bands, rows)
        .withColumn("_batch_id", lit(-1L)),
      indexTable, indexPath,
      _.bucketBy(buckets, "band", "bucket").sortBy("bucket"))
    // round-16: the batch's sketch (shingling + MinHash signature — the
    // batch's heaviest expression work) materializes ONCE and is shared
    // by all three consumers; the old shape recomputed it from the raw
    // text three times (cross probe, within-batch half, index write)
    val sk = sketchOf(batch, idCol, textCol, n, numHashes)
      .localCheckpoint(true)
    val cross = gateCrossPairs(batch, idCol, textCol, indexTable, batchId,
      threshold, n, numHashes, bands, rows, maxBucketSize,
      sketch = Some(sk))
    val within = candidatePairsOfSketch(sk, bands, rows, maxBucketSize)
      .filter(col("jaccard") >= threshold)
      .select(col("id_b").as("new_id"), col("id_a").as("old_id"),
        col("jaccard"))
    val dups = cross.unionByName(within).localCheckpoint(true)
    // index rows for admitted docs = the shared sketch minus rejected ids
    // (identical to re-sketching the admitted batch rows: docs with empty
    // shingle sets are absent from both)
    val admittedSk = sk.join(
      dups.select(col("new_id")).distinct(),
      sk("doc_id") === col("new_id"), "left_anti")
    withDynamicOverwrite(spark) {
      bandRowsOf(admittedSk, bands, rows)
        .withColumn("_batch_id", lit(batchId))
        .write.mode("overwrite")
        .insertInto(indexTable)
    }
    dups
  }

  /** Dynamic-partition-overwrite scope — shared library-wide through
    * `BatchTables` so gate writes, sketch-table writes and compactions on
    * one session all serialize on the same lock (see
    * `BatchTables.withDynamicOverwrite` for the full contract).
    */
  private def withDynamicOverwrite[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T =
    BatchTables.withDynamicOverwrite(spark)(body)

  /** The gate's index-vs-batch join frame, lazy (exposed for plan
    * assertions): the bucketed index scan minus the batch's own partition
    * (crash replay must not meet its previous write), joined against the
    * incoming delta.
    */
  private[graft] def gateCrossPairs(batch: DataFrame, idCol: String,
                                    textCol: String, indexTable: String,
                                    batchId: Long, threshold: Double = 0.8,
                                    n: Int = 3, numHashes: Int = 64,
                                    bands: Int = 16, rows: Int = 4,
                                    maxBucketSize: Int = 1000,
                                    sketch: Option[DataFrame] = None)
      : DataFrame = {
    val idx = batch.sparkSession.table(indexTable)
      .filter(col("_batch_id") =!= batchId) // partition-pruned
      .drop("_batch_id")
    // the gate passes its shared materialized batch sketch; plan-assertion
    // callers omit it and get the self-contained build (same band rows)
    val delta = bandRowsOf(
      sketch.getOrElse(sketchOf(batch, idCol, textCol, n, numHashes)),
      bands, rows)
    incrementalSketchAgainstIndex(idx, delta, threshold, maxBucketSize)
      .filter(col("new_id") =!= col("old_id")) // replay belt-and-braces
  }

  /** Small-file compaction for the gate's index table: a long-lived
    * stream lands one `_batch_id` partition (≤ `buckets` files) per
    * trigger, so file count grows linearly with stream age. Merges all
    * batches `0 <= id <= upToBatchId` AND every previously consolidated
    * (negative) partition into ONE partition `_batch_id = -(upToBatchId+1)`
    * — the negative-horizon discipline of `cdc.Sinks.compactBatches`, but
    * every write goes THROUGH the table (`insertInto`) so the consolidated
    * partition keeps valid bucket files and the exchange-free join
    * property survives compaction. Because prior consolidations are
    * re-merged, the steady state is exactly one negative partition —
    * partition count does NOT grow with compaction-run count (asserted in
    * `TextDedupSpec`); the cost is that each run rewrites the consolidated
    * history, so at scale the cadence should be sized to the index, not
    * the trigger rate.
    *
    * Crash safety: (1) consolidated rows are staged to a scratch path
    * (outside the table root, so partition discovery never sees it);
    * (2) the staged rows are inserted via dynamic partition overwrite —
    * atomic at job commit; (3) only then are source partitions (including
    * superseded negative ones) deleted. A crash between (2) and (3)
    * leaves duplicate rows visible; re-running with the same or any later
    * `upToBatchId` converges: the consolidation read spans everything at
    * or below the horizon and collapses crash duplicates via a FULL-ROW
    * `dropDuplicates` (after normalizing `_batch_id` to the target
    * partition) — crash copies are bit-identical, so they collapse, while
    * a doc_id legitimately re-admitted in a later batch with different
    * text keeps BOTH versions' sketch rows (deduping on (doc_id, band)
    * would arbitrarily mix rows across the two versions).
    *
    * Only compact batches strictly below the streaming checkpoint's
    * committed horizon: a batch the running query may still replay must
    * keep its own partition (a replay dynamic-overwrites it).
    *
    * Calling with an `upToBatchId` BELOW an already-committed horizon is a
    * no-op returning (0, 0): re-consolidating would move rows into a
    * less-negative partition and silently regress the recorded horizon
    * (a later replay of batches between the two horizons would then
    * duplicate). Re-running AT the committed horizon stays the crash
    *-convergence path (skips consolidation, sweeps leftovers).
    *
    * Concurrency: runs for the SAME table must not overlap — the run is
    * serialized against other gate/compaction writes in this JVM (shared
    * lock), and the staging-dir sweep only removes dirs whose horizon is
    * at or below the committed one (a live concurrent run's staging dir
    * has a higher horizon and is left alone). Cross-JVM concurrent
    * compaction of one table is NOT supported.
    *
    * Catalog note: partition dirs are dropped through the catalog
    * (`ALTER TABLE … DROP PARTITION`) when the catalog tracks them, and
    * always deleted from the filesystem + `refreshTable`d — covering both
    * filesystem-discovered (in-memory catalog) and managed-partition
    * (Hive `manageFilesourcePartitions`) tables.
    *
    * Returns (filesBefore, filesAfter) under the affected partitions.
    */
  def compactGateIndex(spark: org.apache.spark.sql.SparkSession,
                       indexTable: String,
                       upToBatchId: Long): (Int, Int) =
    BatchTables.compactBatchPartitions(spark, indexTable, upToBatchId,
      // FULL-ROW dropDuplicates (after the helper normalizes _batch_id to
      // the target partition): crash copies are bit-identical, so they
      // collapse, while distinct sketch rows for a doc_id legitimately
      // re-admitted in a later batch with different text all survive
      // (deduping on (doc_id, band) would arbitrarily mix rows across the
      // two versions).
      _.dropDuplicates())

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
    val inv = keepPairableBuckets(
      sh.select(col("doc_id"), col("sz"),
        explode(slice(sort_array(col("sh")), lit(1), prefLen)).as("h")),
      Seq("h"), maxDF)
    // alias self-join: identical subplans on both sides → ReuseExchange
    // computes the prefix index and its shuffle once
    val cand = inv.alias("ia")
      .join(inv.alias("ib"), col("ia.h") === col("ib.h"))
      .filter(col("ia.doc_id") < col("ib.doc_id") &&
        least(col("ia.sz"), col("ib.sz")) >=
          ceil(greatest(col("ia.sz"), col("ib.sz")) * threshold))
      .select(col("ia.doc_id").as("id_a"), col("ib.doc_id").as("id_b"))
      .distinct()
    verifyJaccard(cand, sh, threshold)
  }

  /** Attach the exact hash-set Jaccard to candidate (id_a, id_b) pairs and
    * filter on `threshold`. The two lookups join the SAME `sh` plan keyed
    * by doc_id, so the exchange (or broadcast) is built once and reused.
    */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame,
                            threshold: Double): DataFrame =
    cand
      .join(sh.alias("sa"), col("id_a") === col("sa.doc_id"))
      .join(sh.alias("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sa.sh"), col("sb.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Exact CONTAINMENT detection — the asymmetric cousin of
    * `jaccardNearDuplicates`: emit (id_sub, id_sup, containment) for every
    * ORDERED pair where containment(sub ⊆ sup) = |S(sub) ∩ S(sup)| /
    * |S(sub)| >= `threshold` over distinct word `n`-gram shingle sets.
    * Jaccard misses these by construction (a 30-word quote inside a
    * 500-word article has J ≈ 0.06 but containment 1.0); this is the
    * subset/quote/excerpt dedup pass — near-identical docs simply show up
    * twice, once per direction.
    *
    * Exact via the asymmetric prefix filter (the containment half of the
    * AllPairs family): order each doc's shingle hashes ascending and index
    * only the first |A| - ceil(t·|A|) + 1 as PROBES — if containment(A⊆B)
    * >= t, at most |A| - ceil(t·|A|) of A's hashes are outside A∩B, so the
    * smallest shared hash sits inside A's prefix — joined against the FULL
    * index of every doc (the container side can't be prefix-pruned: the
    * shared hash's rank in B is unbounded). Candidates verify against the
    * complete sets, so precision is exact and recall is exact up to the
    * `maxDF` guard: full-index buckets with df > maxDF are dropped
    * (boilerplate shingles), and a qualifying pair is missed when EVERY
    * shared gram that lands in the sub-doc's PREFIX is above the cap —
    * the prefix filter guarantees some shared gram sits in the prefix,
    * not a low-df one, so low-df grams shared outside the prefix don't
    * rescue the pair. At the default n=4 word grams that still requires
    * the prefix's shared grams to each be 4-word runs common to > maxDF
    * docs. df-1 buckets can never pair and are dropped too.
    *
    * At 100 TB: probes are ~(1-t) of the shingle volume, the join is
    * equality-keyed on the hash (uniform, high-cardinality), and the
    * verify join touches only candidates — no doc×doc product anywhere.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double = 0.8, n: Int = 4,
                       maxDF: Int = 100000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must be in (0, 1], got $threshold")
    val sh = docs
      .select(col(idCol).as("doc_id"), shingleHashSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))
    val prefLen = (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")
    val probes = sh.select(col("doc_id"),
      explode(slice(sort_array(col("sh")), lit(1), prefLen)).as("h"))
    val full = keepPairableBuckets(
      sh.select(col("doc_id"), explode(col("sh")).as("h")), Seq("h"), maxDF)
    val cand = probes.alias("pa")
      .join(full.alias("fb"), col("pa.h") === col("fb.h"))
      .filter(col("pa.doc_id") =!= col("fb.doc_id"))
      .select(col("pa.doc_id").as("id_sub"), col("fb.doc_id").as("id_sup"))
      .distinct()
    cand
      .join(sh.alias("sa"), col("id_sub") === col("sa.doc_id"))
      .join(sh.alias("sb"), col("id_sup") === col("sb.doc_id"))
      .select(col("id_sub"), col("id_sup"),
        (size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("double") /
          col("sa.sz")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** SimHash-bucketed near-dup with exact Jaccard verification: candidates
    * from the pigeonhole segment join (Hamming ≤ `maxDistance`), output
    * filtered on the exact shingle Jaccard — so the result is identical to
    * the brute-force J ≥ threshold answer whenever every true pair sits
    * within `maxDistance` (measured on the gate corpora: max true-pair
    * distance 10 at 500 docs, 11 at 5,000; the default 12 adds margin).
    *
    * `pieces`/`maxDistance` ≤ 0 (the default) means AUTO: the banding is
    * chosen from the corpus size by `SimHash.autoParams`, keeping the
    * expected candidate volume ~linear in n — wider segments (fewer
    * pieces, tighter distance) as the corpus grows, per the candidate
    * math on `SimHash`. Auto resolves to (13, 12) through the gate scales
    * (n ≤ ~5,100), so gate results are identical to the fixed defaults;
    * beyond that it trades the distance bound down (e.g. (8, 7) at
    * 50,000 docs ≈ 4× less candidate work, covering ~90% of measured
    * J ≥ 0.8 pairs there — the exact-recall path at such scales is
    * `nearDuplicates`/`jaccardNearDuplicates`). Overrides are
    * all-or-nothing: a half-specified banding (`pieces` without
    * `maxDistance` or vice versa) fails fast instead of being silently
    * replaced by auto.
    *
    * `nHint` > 0 supplies the corpus size for auto-banding without the
    * extra `docs.count()` action/scan — at 100 TB the count scan costs as
    * much as the sketch scan it parameterizes, and callers usually know n
    * (table stats, a prior stage's count).
    *
    * `requireExactRecall = true` makes the auto path FAIL FAST when the
    * corpus size pushes the banding past the calibrated exact-recall
    * regime instead of silently trading recall: auto keeps results
    * identical to brute force only while the distance bound covers the
    * measured max true-pair Hamming (11 at 5,000 docs; bound 12 at the
    * (13, 12) banding). Beyond that (auto = (8, 7) at 50k, (6, 5) at
    * 500k — 75.9% measured recall) callers who need every J ≥ threshold
    * pair get an exception naming the exact-recall alternatives
    * (`nearDuplicates` MinHash banding, `jaccardNearDuplicates` prefix
    * filter) rather than a silently incomplete answer. The default stays
    * false: the recall trade IS the LSH contract at scale, and it is
    * documented rather than forbidden.
    */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                            threshold: Double = 0.8, maxDistance: Int = 0,
                            pieces: Int = 0, n: Int = 3,
                            nHint: Long = 0L,
                            requireExactRecall: Boolean = false): DataFrame = {
    require((pieces > 0) == (maxDistance > 0),
      s"specify both pieces and maxDistance or neither (got pieces=$pieces, " +
        s"maxDistance=$maxDistance) — a half-specified banding would be " +
        "silently replaced by autoParams")
    val (p, d) =
      if (pieces > 0) (pieces, maxDistance)
      else SimHash.autoParams(if (nHint > 0) nHint else docs.count())
    require(!requireExactRecall || d >= SimHash.ExactRecallMinDistance,
      s"banding ($p, $d) is past the calibrated exact-recall regime " +
        s"(distance bound < ${SimHash.ExactRecallMinDistance}; measured max " +
        "true-pair Hamming at J >= 0.8 is 11 at 5,000 docs and grows with " +
        "the corpus — at this scale SimHash LSH trades recall, 75.9% " +
        "measured at 500k docs with (6, 5)). For exact recall use " +
        "TextDedup.nearDuplicates (MinHash banding) or " +
        "TextDedup.jaccardNearDuplicates (prefix-filtered inverted index), " +
        "or pass requireExactRecall = false to accept the trade")
    val sh = docs
      .select(col(idCol).as("doc_id"), shingleHashSet(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    verifyJaccard(
      SimHash.nearDuplicates(docs, idCol, textCol, d, p, n)
        .select("id_a", "id_b"),
      sh, threshold)
  }

  /** Shared-SUBSTRING overlap detection — the substring-granular dedup
    * family (the phenomenon Lee et al.'s "Deduplicating Training Data
    * Makes Language Models Better" dedups at; their suffix-array exact
    * scan is replaced here by winnowing fingerprints, which guarantee a
    * shared fingerprint for any shared substring of length ≥ k+w−1 chars,
    * Schleimer et al. SIGMOD'03).
    *
    * A pair is reported with the count of RARE fingerprints it shares:
    * fingerprints occurring in more than `dfCap` documents are dropped
    * first (corpus boilerplate — their buckets fan out quadratically and
    * identify nothing), then one equality self-join on the fingerprint
    * feeds a (id_a, id_b) count aggregate, thresholded at `minShared`.
    * Same candidate discipline as every other dedup here: equality
    * buckets only, never an all-pairs product.
    *
    * Size `dfCap` to the expected DUPLICATE-CLUSTER size, not the corpus:
    * a verbatim run shared by a cluster of c docs puts its fingerprints at
    * df ≈ c, so dfCap < c silently drops the very pairs the operator
    * exists to find (measured: cap 4 found 21 pairs at 500 docs and ZERO
    * at 5000, where planted clusters exceed 4 members), while boilerplate
    * df grows with the corpus and stays safely above any sane cap.
    *
    * `dfCap` ≤ 0 (the default) means AUTO: `autoDfCap(docs.count())` —
    * cluster size scales linearly with the corpus under a constant
    * duplication rate, so the cap follows n with a floor at the
    * historically-calibrated 16. Measured on the 10× sweep corpus
    * (50,000 docs): every fixed cap ≤ 160 finds ZERO pairs there (the
    * planted clusters' fingerprint df is ~10× the 5,000-doc corpus's),
    * cap 256 recovers them (43 pairs), and 512 explodes into boilerplate
    * (4.5M pairs) — auto lands at 261, inside the working band. Callers
    * with a known cluster-size bound should still pass it explicitly
    * (the declared gate query pins 16, its fixtures' cluster scale).
    *
    * SCALE BOUNDARY (measured, round-8 100× sweep): the pair output is
    * Θ(Σ c²) over duplicate-cluster sizes c — when clusters reach the
    * thousands (the 500k-doc sweep corpus aliases its planted clusters to
    * c ≈ 2,600) the join output is ~10⁹ rows for ANY in-band cap and the
    * operator OOMs by construction, not by miscalibration. Past that
    * regime use `substringClusters` below: identical rare-fingerprint
    * index, cluster-granular (linear) output.
    */
  def autoDfCap(n: Long): Int = math.max(16L, (n + 191L) / 192L).toInt

  /** `nHint` > 0 supplies the corpus size for `autoDfCap` without the
    * extra `docs.count()` action — same contract as
    * `simhashNearDuplicates`' hint.
    */
  def substringOverlap(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 8, w: Int = 4, dfCap: Int = 0,
                       minShared: Long = 10L, nHint: Long = 0L): DataFrame = {
    val cap = if (dfCap > 0) dfCap
      else autoDfCap(if (nHint > 0) nHint else docs.count())
    val fp = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.winnowingFingerprint(col(textCol), k, w)).as("f"))
    val rare = keepPairableBuckets(fp, Seq("f"), cap)
    rare.alias("fa")
      .join(rare.alias("fb"), col("fa.f") === col("fb.f"))
      .filter(col("fa.doc_id") < col("fb.doc_id"))
      .groupBy(col("fa.doc_id").as("id_a"), col("fb.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** CLUSTER-granular substring dedup — the shape that survives large
    * duplicate clusters, where the pair form above cannot: `substring
    * Overlap` emits Θ(c²) rows for a c-member cluster of shared runs, and
    * the round-8 100× sweep measured that boundary directly (500k-doc
    * corpus whose planted clusters alias across copies to c ≈ 2,600:
    * every in-band dfCap OOMs a 48 GB executor pool on the pair join,
    * because the OUTPUT is ~10⁹ rows regardless of how the cap is
    * chosen). Here each rare-but-shared fingerprint contributes STAR
    * edges instead — bucket members link to the bucket's minimum doc_id
    * — which is connectivity-equivalent to the bucket clique, so
    * connected components give exactly the components of the "shares ≥ 1
    * rare fingerprint" graph with per-bucket output LINEAR in bucket
    * size.
    *
    * The edge unit is the SUPER-fingerprint (`winnowingSuperFingerprint`):
    * `s` consecutive recorded winnowing minima hashed into one 64-bit key,
    * witnessing a shared verbatim run of ~ k+w−1+(s−1)(w+1)/2 ≈ 38 chars
    * at the defaults — comparable evidence to the pair form's
    * minShared=10 floor. Weaker edge units chain transitively (measured
    * at sf0.01: single fingerprints merge ALL 500 docs into one
    * component, s=6 still leaves a 453-doc component; s=12 sits on the
    * stable 23-cluster plateau that covers every doc of the pair query's
    * graph — see `Winnow.superFingerprint`).
    *
    * Contract differences from the pair form, both deliberate: (1) the
    * pair-wise `minShared` count is replaced by the per-key run-length
    * evidence above (membership is single-linkage over strong edges);
    * (2) output is (cluster_id = component min doc_id, doc_id) for every
    * doc in a nontrivial cluster, ready for keep-one dedup.
    * `dfCap`/`nHint` follow `substringOverlap`'s auto contract.
    */
  def substringClusters(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, w: Int = 4, s: Int = 12, dfCap: Int = 0,
                        nHint: Long = 0L, maxIter: Int = 20): DataFrame = {
    val cap = if (dfCap > 0) dfCap
      else autoDfCap(if (nHint > 0) nHint else docs.count())
    val fp = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.winnowingSuperFingerprint(col(textCol), k, w, s))
        .as("f"))
    // one aggregate finds each pairable bucket's size AND its seed — the
    // star-edge join then shuffles only (f, seed) against the fingerprint
    // frame, never bucket×bucket
    val seeds = fp.groupBy(col("f"))
      .agg(count(lit(1)).as("_bsz"), min(col("doc_id")).as("seed"))
      .filter(col("_bsz") >= 2 && col("_bsz") <= cap)
      .select(col("f"), col("seed"))
    val edges = fp.join(seeds, Seq("f"))
      .filter(col("doc_id") =!= col("seed"))
      .select(col("seed").as("id_a"), col("doc_id").as("id_b"))
      .distinct()
    Components.connectedComponents(edges, maxIter = maxIter)
      .select(col("component").as("cluster_id"), col("id").as("doc_id"))
  }

  /** EXACT duplicate-span detection — the deterministic complement to
    * the winnowing fingerprint path (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": the standard
    * LLM-curation pass removes exact substrings repeated across the
    * corpus, not just near-duplicate documents). A fixed-L token n-gram
    * appearing in MORE THAN ONE document marks its L token positions as
    * duplicated; per document, overlapping/adjacent marked windows merge
    * into maximal spans. Winnowing SAMPLES minima and can miss a short
    * exact span entirely (spec-pinned on such a fixture); this pass is
    * exact at its granularity: every cross-doc verbatim run of ≥ L
    * tokens is reported, nothing else is.
    *
    * Output: (doc_id, span_start, span_end, n_tokens) — token indices,
    * 0-based inclusive, ordered within doc. Spans are DETECTION output;
    * removal policy (keep one canonical occurrence) is the caller's,
    * exactly as with the near-dup pair operators.
    *
    * Shape: positional shingle hashes in ONE codegen pass
    * (`ShingleHash.positionalHashes` — position-indexed, duplicates
    * kept), gram df by distinct-doc count (shuffle on the 64-bit gram
    * hash — uniform), a semi-join back, then per-doc gaps-and-islands
    * (lag + running sum windows PARTITIONED BY doc — partition-parallel,
    * sized by the duplicated positions only, not the corpus). The gram
    * value itself never leaves the scan: the engine joins 64-bit hashes
    * while the oracle joins raw gram strings (the decontaminate
    * discipline — a collision would surface as a gate mismatch).
    */
  /** The REMOVAL step over [[exactSubstringSpans]]' detection — Lee et
    * al.'s "remove all but one occurrence": for each cross-doc
    * duplicated L-gram the CANONICAL holder is the minimum doc_id among
    * the docs containing it; every other doc's occurrence positions are
    * removed, the canonical copy survives. Output per input doc:
    * (doc_id, clean_text, n_tokens, n_removed) — docs losing every
    * token keep an empty clean_text row (total function of the corpus).
    *
    * Per-gram canonical keep (not per-merged-span): a span merged from
    * grams with DIFFERENT canonical holders removes exactly the
    * positions whose own gram is non-canonical — deterministic,
    * SQL-replayable, and never deletes the last copy of any gram.
    * Within-doc repeats in the canonical doc survive (cross-doc
    * contract, same as the detector).
    *
    * Shape: the detector's positional-hash scan + one keeper aggregate,
    * position-explode of removable windows (×L — bounded by the
    * duplicated volume, not the corpus), one anti-join on (doc, pos),
    * and a per-doc ordered re-assembly (collect_list + sort — per-doc
    * work, partition-parallel).
    */
  def exactSubstringDedupText(docs: DataFrame, idCol: String,
                              textCol: String, l: Int): DataFrame = {
    require(l >= 2, s"span gram length must be >= 2 tokens, got $l")
    val grams = docs
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.ShingleHash
          .positional_shingle_hashes(col(textCol), l)))
      .select(col("doc_id"), col("pos").cast("long").as("i"),
        col("col").as("gh"))
      .localCheckpoint(true)
    val keepers = grams.groupBy(col("gh"))
      .agg(count_distinct(col("doc_id")).as("nd"),
        min(col("doc_id")).as("keeper"))
      .filter(col("nd") > 1)
      .select(col("gh"), col("keeper"))
    val covered = grams.join(keepers, Seq("gh"))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + l - 1)).as("pos"))
      .distinct()
    val tokens = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ", -1)).as(Seq("pos", "tok")))
      .withColumn("pos", col("pos").cast("long"))
    val kept = tokens.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            e => e.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ", -1)).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  def exactSubstringSpans(docs: DataFrame, idCol: String, textCol: String,
                          l: Int): DataFrame = {
    require(l >= 2, s"span gram length must be >= 2 tokens, got $l")
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.ShingleHash
          .positional_shingle_hashes(col(textCol), l)))
      .select(col("doc_id"), col("pos").cast("long").as("i"),
        col("col").as("gh"))
      .localCheckpoint(true) // shared by the df pass and the mark pass
    val dup = grams.groupBy(col("gh"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("gh"))
    val marked = grams.join(dup, Seq("gh"), "left_semi")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    marked
      .withColumn("brk",
        when(col("i") - lag(col("i"), 1).over(byDoc) <= l, lit(0))
          .otherwise(lit(1)))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("i")).as("span_start"),
        (max(col("i")) + l - 1).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("n_tokens"))
  }
}

/** 64-bit SimHash over the shingle hash set, with banded near-dup search:
  * split the fingerprint into `pieces` segments — any pair at Hamming
  * distance ≤ pieces-1 shares at least one exact segment (pigeonhole), so
  * the candidate join is again equality-bucketed, never all-pairs.
  *
  * Candidate growth at scale (measured in the round-6 10× sweep): with p
  * pieces over 64 bits each segment carries ~64/p bits, so each piece's
  * buckets hold ~n/2^(64/p) docs and the candidate volume is
  * ≈ p · n² / 2^(64/p+1) — quadratic in n with a constant set ENTIRELY by
  * the segment width. The defaults (maxDistance 12 ⇒ 13 pieces ⇒ ~5-bit
  * segments) are comfortable to ~10⁵ docs; beyond that either tighten
  * `maxDistance` (distance 6 ⇒ 7 pieces ⇒ 9-bit segments ⇒ ~16× fewer
  * candidates — observed distances at J ≥ 0.9 are ≤ 10, so tighter
  * bounds suit higher thresholds), or prefer the banded-MinHash path
  * (`nearDuplicates`), whose bucket keys hash the full band value and so
  * don't dense-pack. The pigeonhole form stays the right tool when the
  * fingerprints are precomputed or the corpus fits the width budget.
  */
object SimHash {

  /** Corpus-size-driven banding: the largest piece count (loosest Hamming
    * bound, best recall) whose expected candidate volume stays within a
    * fixed per-doc budget. From the candidate math above, p pieces give
    * ~64/p-bit segments and ≈ p·n/2^(64/p+1) expected candidates per doc
    * on uniform (dissimilar-doc) fingerprints, so the rule is
    *
    *   pieces = max { p ∈ ladder : p·n/2^(64/p+1) ≤ budget },
    *   maxDistance = pieces − 1
    *
    * with budget 1100 calibrated so the gate scales keep the historical
    * (13, 12) banding (n = 5,000 sits just inside: 13·5000/2^5.92 ≈ 1073)
    * and larger corpora widen segments exponentially: (8, 7) at 50k docs,
    * (7, 6) to ~180k, floor (4, 3) — 16-bit segments — good to tens of
    * millions. This is the SemDeDup k-scaling discipline applied to the
    * pigeonhole search: the data size picks the constant, the shape of
    * the plan never changes.
    *
    * The trade is explicit: tightening maxDistance lowers recall on
    * far-apart true pairs (measured max true-pair Hamming at J ≥ 0.8:
    * 10/11/15 at 500/5k/50k docs), which is the correct LSH contract at
    * scale — exactness at a FIXED threshold belongs to the MinHash-banded
    * and prefix-filter paths.
    */
  def autoParams(n: Long, budget: Double = 1100.0,
                 maxPieces: Int = 13): (Int, Int) = {
    val ladder = Seq(13, 11, 9, 8, 7, 6, 5, 4).filter(_ <= maxPieces)
    require(ladder.nonEmpty, s"maxPieces must be >= 4, got $maxPieces")
    val p = ladder
      .find(p => p * n.toDouble / math.pow(2.0, 64.0 / p + 1.0) <= budget)
      .getOrElse(4)
    (p, p - 1)
  }

  /** The smallest Hamming bound the corpus calibration showed to be
    * EXACT-recall at a J >= 0.8 threshold: measured max true-pair
    * distance is 10 at 500 docs and 11 at 5,000 (the (13, 12) banding's
    * bound 12 covers both with margin), while 50k-doc corpora already
    * reach 15. `simhashNearDuplicates(requireExactRecall = true)` fails
    * fast when auto-banding drops below this.
    */
  val ExactRecallMinDistance = 12

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
    val fp = docs
      .select(col(idCol).as("doc_id"),
        TextDedup.shingleHashSet(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("fp", simhash64(col("sh")))
      .select(col("doc_id"), col("fp"))
    hammingPairs(fp, "doc_id", "fp", maxDistance, pieces)
  }

  /** Pigeonhole Hamming join over ANY 64-bit fingerprint column (shared by
    * the SimHash text path and `Multimodal.imageDedup`'s perceptual
    * hashes): pairs with Hamming(hash) ≤ `maxDistance`, found exactly —
    * split into `pieces` > maxDistance segments, a qualifying pair shares
    * at least one exact segment, verify on the full hash.
    *
    * Segments cover ALL 64 bits with near-equal widths (⌈64/pieces⌉ then
    * ⌊64/pieces⌋): wider segments mean exponentially more buckets per
    * piece, which is what bounds candidate fan-out — at 13 pieces this is
    * 12 five-bit + 1 four-bit segments (32-value buckets) instead of
    * uniform four-bit ones, halving bucket collisions.
    */
  def hammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
                   maxDistance: Int, pieces: Int): DataFrame = {
    // pigeonhole completeness: with pieces <= maxDistance a qualifying
    // pair need not share ANY exact segment, and the join silently loses
    // recall — fail fast instead (hammingAgainstIndex has the same guard)
    require(pieces > maxDistance, "need pieces > maxDistance for full recall")
    val fp = segmentIndex(hashes, idCol, hashCol, pieces)
    // singleton segments can never collide — prune them before the
    // self-join (lossless: Int.MaxValue cap = no bucket dropped)
    val pairable = TextDedup.keepPairableBuckets(fp, Seq("piece", "seg"), Int.MaxValue)
    // alias self-join keeps both sides the identical subplan → the segment
    // sketch and its shuffle are computed once (ReuseExchange)
    pairable.alias("a")
      .join(pairable.alias("b"),
        col("a.piece") === col("b.piece") && col("a.seg") === col("b.seg"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming(col("a.fp"), col("b.fp")).as("distance"))
      .filter(col("distance") <= maxDistance)
      .distinct()
  }

  /** The PERSISTABLE Hamming index: one (doc_id, fp, piece, seg) row per
    * segment of each 64-bit fingerprint — `hammingPairs`' explode, exposed
    * so a corpus's sketch can be written ONCE with
    * `.bucketBy(B, "piece", "seg").saveAsTable(...)` and every delta batch
    * joins it exchange-free on the index side (the bucketed scan reports
    * the join's hash partitioning — the same 100 TB discipline as
    * `TextDedup.bandedIndex`, here for perceptual image/audio hashes and
    * SimHash fingerprints alike).
    */
  def segmentIndex(hashes: DataFrame, idCol: String, hashCol: String,
                   pieces: Int): DataFrame = {
    require(pieces >= 1 && pieces <= 64, "pieces must be in 1..64")
    val wide = 64 % pieces       // this many segments get an extra bit
    val base = 64 / pieces
    val widths = Seq.tabulate(pieces)(p => if (p < wide) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    hashes
      .select(col(idCol).as("doc_id"), col(hashCol).as("fp"))
      .select(col("doc_id"), col("fp"),
        explode(array(Seq.tabulate(pieces) { p =>
          struct(lit(p).as("piece"),
            call_function("shiftright", col("fp"), lit(offsets(p)))
              .bitwiseAND(lit((1L << widths(p)) - 1)).as("seg"))
        }: _*)).as("pk"))
      .select(col("doc_id"), col("fp"),
        col("pk.piece").as("piece"), col("pk.seg").as("seg"))
  }

  /** Delta-vs-index Hamming pairs — the incremental re-ingest shape:
    * (new_id, old_id, distance ≤ maxDistance) between an incoming batch
    * and a persisted `segmentIndex` built with the SAME `pieces`. Exact
    * for the hash by the usual pigeonhole argument (maxDistance <
    * pieces); identical ids are filtered (a crash-replayed batch meets
    * its own rows, per the streaming-gate lesson). `maxBucketSize` caps
    * index buckets (degenerate content — all-black images, silence —
    * piles thousands of fingerprints on one segment value; the cap costs
    * candidate recall ONLY for pairs whose every shared segment is
    * degenerate). The index side joins without an exchange when the
    * table is bucketed by (piece, seg); only the delta shuffles —
    * spec-asserted like the text index.
    */
  def hammingAgainstIndex(index: DataFrame, delta: DataFrame,
                          idCol: String, hashCol: String,
                          maxDistance: Int, pieces: Int,
                          maxBucketSize: Int = 100000): DataFrame = {
    require(pieces > maxDistance, "need pieces > maxDistance for full recall")
    val cappedIdx = TextDedup.keepPairableBuckets(index, Seq("piece", "seg"),
      maxBucketSize, minSize = 1)
    val nw = segmentIndex(delta, idCol, hashCol, pieces)
    nw.alias("nw")
      .join(cappedIdx.alias("ex"),
        col("nw.piece") === col("ex.piece") && col("nw.seg") === col("ex.seg"))
      .filter(col("nw.doc_id") =!= col("ex.doc_id"))
      .select(col("nw.doc_id").as("new_id"), col("ex.doc_id").as("old_id"),
        hamming(col("nw.fp"), col("ex.fp")).as("distance"))
      .filter(col("distance") <= maxDistance)
      .distinct()
  }
}
