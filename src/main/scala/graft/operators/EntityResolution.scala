package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution by the sorted-neighborhood method (Hernández
  * & Stolfo 1995) — approximate-string record linkage WITHOUT the n²
  * comparison matrix. The missing member of the matching family: the
  * text-dedup operators match token/shingle SETS (order-free, whole
  * documents), while record linkage matches short STRINGS (names, codes,
  * addresses) under edit distance, where a one-character typo must still
  * pair ("widgget" ↔ "widget") — shingle Jaccard over-penalizes short
  * strings and gives no metric guarantee.
  *
  * Construction: impose a total order on the blocking key (key asc, id
  * asc as tiebreak — deterministic), rank every row, and compare each
  * row only to the `w−1` rows after it in rank order. Typo'd variants
  * sort adjacently (for prefix typos, use a second pass on a reversed or
  * phonetic key and union the pair sets — passes compose), so a small
  * window catches them while the candidate count stays n·(w−1) — linear,
  * not quadratic. Verification is exact Levenshtein (codegen built-in)
  * on the candidates only.
  *
  * Scale shape: the global rank NEVER runs a global window — it is the
  * `Ingest.autoIncrement` partition-offset idiom (range-partition on the
  * sort key, count each partition, exclusive-prefix ONE ROW PER
  * PARTITION, broadcast offsets + partition-local row_number). The
  * neighborhood join is an equi-join on rank (each row replicated w−1
  * times via a `sequence` explode — shuffle volume n·(w−1), keys
  * uniform by construction since ranks are distinct integers). No
  * window over data, no skew: this is the same plan at 100 TB, and the
  * range partitioner's key sampling keeps partitions balanced even when
  * the key distribution is lumpy.
  */
object EntityResolution {

  /** Global rank 0..n−1 over (`keyCol` asc, `idCol` asc) without a
    * global window: range-partition, per-partition counts, broadcast
    * exclusive-prefix offsets, partition-local row_number. Output: the
    * input columns + `_rank` BIGINT.
    */
  def globalRank(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val ranged = df.repartitionByRange(col(keyCol), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = ranged.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_offset", coalesce(
        sum(col("_n")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_offset"))
    val w = Window.partitionBy(col("_pid")).orderBy(col(keyCol), col(idCol))
    ranged.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_rank",
        row_number().over(w).cast("long") + col("_offset") - 1L)
      .drop("_pid")
  }

  /** Candidate pairs within a sorted-neighborhood window of `w`:
    * (id_a, key_a, id_b, key_b, rank_gap) for every pair at rank
    * distance 1..w−1, with a the lower-ranked row. Deterministic: the
    * order is total, so the pair set is partition-layout-invariant.
    */
  def neighborhoodPairs(df: DataFrame, idCol: String, keyCol: String,
                        w: Int): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    // consumed twice (probe side + join side) INSIDE one job: the two
    // subplans are identical, so ReuseExchange computes the rank once —
    // an eager localCheckpoint here measured SLOWER (extra
    // materialization job for no avoided work; checkpoint pays only
    // across separate actions, as in PageRank's loop)
    val ranked = globalRank(df, idCol, keyCol)
      .select(col(idCol).as("id"), col(keyCol).as("key"), col("_rank"))
    val probes = ranked
      .select(col("id").as("id_a"), col("key").as("key_a"),
        col("_rank").as("_r0"),
        explode(sequence(lit(1), lit(w - 1))).as("rank_gap"))
      .select(col("id_a"), col("key_a"), col("rank_gap"),
        (col("_r0") + col("rank_gap")).as("_rank"))
    probes.join(ranked, "_rank")
      .select(col("id_a"), col("key_a"), col("id").as("id_b"),
        col("key").as("key_b"), col("rank_gap"))
  }

  /** Fuzzy-match pairs: neighborhood candidates whose keys sit within
    * Levenshtein `maxDist` (exact verification, codegen). Output:
    * (id_a, id_b, key_a, key_b, dist BIGINT), a the lower-ranked row.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, keyCol: String,
                 w: Int, maxDist: Int): DataFrame =
    neighborhoodPairs(df, idCol, keyCol, w)
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"),
        col("dist"))

  /** Multi-pass fuzzy matching: the plain pass unioned with a
    * REVERSED-key pass. A single sorted neighborhood misses PREFIX
    * typos — "qidget" sorts nowhere near "widget" — but their reversals
    * ("tegdiq"/"tegdiw") are suffix-typo neighbors, and edit distance is
    * reversal-invariant, so the reversed pass verifies with the same
    * Levenshtein bound and catches exactly that class. Each pass keeps
    * its own rank machinery (two n·(w−1) candidate sets — still linear);
    * pairs are normalized to `id_a < id_b` (a pair can surface in either
    * orientation depending on which pass found it) and deduped on the id
    * pair. Output: (id_a, id_b, key_a, key_b, dist) with id_a < id_b.
    */
  def fuzzyPairsMultiPass(df: DataFrame, idCol: String, keyCol: String,
                          w: Int, maxDist: Int): DataFrame = {
    // reversed pass: block on reverse(key), report the ORIGINAL keys —
    // levenshtein(reverse(a), reverse(b)) == levenshtein(a, b)
    val rev = fuzzyPairs(
        df.withColumn("_rkey", reverse(col(keyCol))), idCol, "_rkey",
        w, maxDist)
      .select(col("id_a"), col("id_b"),
        reverse(col("key_a")).as("key_a"), reverse(col("key_b")).as("key_b"),
        col("dist"))
    val lo = col("id_a") <= col("id_b")
    fuzzyPairs(df, idCol, keyCol, w, maxDist)
      .unionByName(rev)
      .select(
        when(lo, col("id_a")).otherwise(col("id_b")).as("id_lo"),
        when(lo, col("id_b")).otherwise(col("id_a")).as("id_hi"),
        when(lo, col("key_a")).otherwise(col("key_b")).as("key_lo"),
        when(lo, col("key_b")).otherwise(col("key_a")).as("key_hi"),
        col("dist"))
      .dropDuplicates("id_lo", "id_hi")
      .select(col("id_lo").as("id_a"), col("id_hi").as("id_b"),
        col("key_lo").as("key_a"), col("key_hi").as("key_b"), col("dist"))
  }
}
