package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit and enforcement over quasi-identifier
  * columns — the privacy gate a training-data pipeline runs before a
  * table with person-adjacent attributes (zip, age band, segment …) may
  * ship (Sweeney's k-anonymity; Machanavajjhala's l-diversity).
  *
  * A row is k-anonymous when at least k rows share its full
  * quasi-identifier (QI) combination — an attacker matching on the QIs
  * cannot narrow below k candidates. l-diversity additionally requires
  * the sensitive attribute to take >= l distinct values within the
  * group, or the whole group leaks the sensitive value even at high k.
  *
  * Everything is ONE hash aggregation over the QI combination (map-side
  * combined; the QI key space is its own bound — census-style QIs give
  * thousands of groups off any table size), and every metric is an exact
  * BIGINT: group size, distinct sensitive values, flags by integer
  * comparison. NULL QI values form their own group (SQL GROUP BY
  * semantics, identical in the DuckDB oracle); a NULL sensitive value
  * counts as zero diversity contribution (count_distinct skips NULLs) —
  * a group of all-NULL sensitives has l = 0 and fails any l >= 1
  * requirement, the conservative reading.
  *
  * Enforcement (`enforceKAnonymity`) keeps exactly the rows whose QI
  * group clears k — suppression, the non-destructive baseline (no value
  * generalization, no synthetic rows). The group census rides back onto
  * rows via a broadcast-friendly join on the QI key (|groups| rows, not
  * |data|), never a data-sized window.
  */
object Privacy {

  /** Per-QI-group census: one row per distinct QI combination with
    * `group_n` (its size), `l_diversity` (distinct non-NULL sensitive
    * values), and the two verdict flags under the supplied thresholds.
    */
  def privacyAudit(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                   k: Long, l: Long = 1L): DataFrame = {
    require(qiCols.nonEmpty, "privacyAudit needs at least one QI column")
    require(k >= 1 && l >= 1, s"thresholds must be >= 1, got k=$k l=$l")
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("group_n"),
        count_distinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("k_anonymous", col("group_n") >= k)
      .withColumn("l_diverse", col("l_diversity") >= l)
  }

  /** One-row summary: the k the table actually achieves (its smallest
    * QI group), the l it achieves, group count, and how many ROWS sit in
    * groups below the requested k (the re-identification surface).
    */
  def privacySummary(df: DataFrame, qiCols: Seq[String],
                     sensitiveCol: String, k: Long): DataFrame =
    privacyAudit(df, qiCols, sensitiveCol, k)
      .agg(
        min(col("group_n")).as("k_achieved"),
        min(col("l_diversity")).as("l_achieved"),
        count(lit(1)).as("n_groups"),
        sum(when(col("group_n") < k, col("group_n")).otherwise(lit(0L)))
          .as("rows_at_risk"))

  /** Suppression enforcement: the input rows whose QI group has >= k
    * members. The census join key is the QI tuple — |groups| rows on the
    * build side, broadcast at any realistic QI cardinality.
    */
  def enforceKAnonymity(df: DataFrame, qiCols: Seq[String],
                        k: Long): DataFrame = {
    require(qiCols.nonEmpty, "enforceKAnonymity needs a QI column")
    require(k >= 1, s"k must be >= 1, got $k")
    val safe = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("_gn"))
      .filter(col("_gn") >= k)
      .drop("_gn")
    // null-safe equi-join: NULL QI groups must match themselves, exactly
    // as GROUP BY grouped them
    val cond = qiCols.map(c => df(c) <=> safe(c)).reduce(_ && _)
    df.join(broadcast(safe), cond, "leftsemi")
  }

  /** Deterministic pseudonymization — the JOIN-PRESERVING sibling of
    * `cdc.Mask`'s destructive redaction: each listed column is replaced
    * by `md5(salt ‖ ':' ‖ value)`, so equal values map to equal tokens
    * across every table sharing the salt (foreign keys keep joining,
    * group-bys keep grouping) while the raw value never leaves the
    * cluster. NULL stays NULL (a token for NULL would conflate missing
    * with a real value). Scan-side codegen'd projection — zero shuffle.
    *
    * Contract: md5 here is keyed-lookup-resistance against an attacker
    * WITHOUT the salt; it is not reversible-encryption, and salt rotation
    * re-keys every token (all referential joins must use one salt epoch).
    * Low-cardinality columns remain guessable by dictionary attack with
    * the salt — pseudonymization is a governance tool, not k-anonymity;
    * compose with `enforceKAnonymity` for the latter.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String],
                   salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize needs at least one column")
    require(salt.nonEmpty, "an empty salt defeats the keyed-token contract")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isNotNull,
          md5(concat(lit(salt), lit(":"), col(c).cast("string")))))
    }
  }

  /** ε-differentially-private count release via the Laplace mechanism
    * (Dwork et al. 2006): per group, `count + Laplace(1/ε)` — count
    * queries have L1 sensitivity 1, so scale 1/ε gives ε-DP. The noise
    * draws through the inverse CDF
    * `x = −(1/ε)·sgn(u−½)·ln(1−2|u−½|)` from a uniform u derived as the
    * md5-hex52 of (seed, group key) — the round-9 deterministic-sampling
    * idiom, so a FIXED seed replays bit-exactly in the oracle and in
    * retries.
    *
    * Stated honestly: determinism is a TEST-HARNESS property, not a
    * privacy property. A real release draws the seed fresh and keeps it
    * secret (a published seed voids the guarantee; repeated releases
    * under different seeds compose ε-additively). The operator releases
    * ONLY the noised count — never the true count beside it.
    *
    * Shape: one hash aggregation + scan-side noise arithmetic; the
    * release is |groups| rows regardless of data size. ln shares are
    * ln-derived → callers round(,6) for output (the ln discipline).
    */
  /** u in (0,1) keyed on (seed, group): 52 md5-hex-derived bits +
    * half-step — never exactly 0, ½ (the +0.5/2^52 offset is irrational
    * in halves), or 1. Each group value is md5-hashed SEPARATELY before
    * the outer digest: a separator-joined concat was NOT injective
    * (values containing the separator, and NULLs silently dropped by
    * concat_ws, collided DISTINCT groups onto the identical noise draw,
    * breaking per-group independence — ADVICE r12). md5 blocks are a
    * fixed 32 hex chars and NULL encodes as the non-hex token '@NULL@',
    * so the block sequence parses back unambiguously.
    */
  private def keyedUniform(seed: String, groupCols: Seq[String]): Column = {
    val enc = groupCols.map(c =>
      coalesce(md5(col(c).cast("string")), lit("@NULL@")))
    (conv(substring(md5(concat(lit(seed) +: enc: _*)), 1, 13), 16, 10)
      .cast("double") + 0.5) / lit(4503599627370496.0) // 2^52
  }

  /** Laplace(scale) draw through the inverse CDF:
    * `−scale·sgn(u−½)·ln(1−2|u−½|)`.
    */
  private def laplaceNoise(u: Column, scale: Double): Column = {
    val centered = u - 0.5
    lit(-scale) * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
  }

  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
               seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(groupCols.nonEmpty, "dpCounts needs at least one group column")
    require(seed.nonEmpty, "an empty seed defeats the keyed-draw contract")
    val noise = laplaceNoise(keyedUniform(seed, groupCols), 1.0 / epsilon)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .select(groupCols.map(col) :+
        (col("_n").cast("double") + noise).as("dp_count"): _*)
  }

  /** The clamped value that enters a DP sum: NULL stays NULL (the sum
    * skips it — a NULL measurement contributes nothing, exactly like
    * SQL), everything else is clipped into [lo, hi]. The explicit
    * isNotNull guard matters: `greatest`/`least` SKIP NULLs in both
    * engines, so an unguarded clamp would resurrect NULL as `lo`.
    * Clamp-before-sum is the order the sensitivity argument needs —
    * clipping the SUM would leave per-row influence unbounded.
    */
  private def clamped(valueCol: String, lo: Double, hi: Double): Column =
    when(col(valueCol).isNotNull,
      least(greatest(col(valueCol).cast("double"), lit(lo)), lit(hi)))

  /** Exact per-group sum of the clamped values: each clamped double is
    * one fixed IEEE expression (identical in both engines), and the SUM
    * runs in DECIMAL(38,6) so partial-aggregation ORDER cannot wobble
    * the result — the integer-numerator discipline, decimal-shaped
    * (a float sum over shuffled partitions differs run to run in the
    * last ulp; a decimal sum never does). The 6-dp quantization is
    * deterministic and shared with the oracle's identical cast.
    */
  private def clampedSum(valueCol: String, lo: Double, hi: Double): Column =
    sum(clamped(valueCol, lo, hi)
      .cast(org.apache.spark.sql.types.DecimalType(38, 6)))

  /** ε-differentially-private SUM release with clamped sensitivity:
    * per group, `Σ clamp(v, lo, hi) + Laplace((hi−lo)/ε)`. Under
    * bounded DP (neighboring datasets REPLACE one row), a row's
    * influence on the clamped sum is at most hi−lo, so scale (hi−lo)/ε
    * gives ε-DP — the clamp is what makes the sensitivity finite and is
    * applied per ROW, before the sum (spec-pinned ordering). Same
    * keyed-draw replayability and honesty framing as [[dpCounts]]: the
    * determinism is a test-harness property; a real release draws the
    * seed fresh and keeps it secret. The release carries ONLY the
    * noised sum.
    *
    * Shape: one hash aggregation (map-side combined) + scan-side clamp
    * arithmetic; the release is |groups| rows regardless of data size.
    */
  def dpSums(df: DataFrame, groupCols: Seq[String], valueCol: String,
             lo: Double, hi: Double, epsilon: Double,
             seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(hi > lo, s"clamp bounds must satisfy lo < hi, got [$lo, $hi]")
    require(groupCols.nonEmpty, "dpSums needs at least one group column")
    require(seed.nonEmpty, "an empty seed defeats the keyed-draw contract")
    val noise = laplaceNoise(keyedUniform(seed, groupCols),
      (hi - lo) / epsilon)
    df.groupBy(groupCols.map(col): _*)
      .agg(clampedSum(valueCol, lo, hi).as("_s"))
      .select(groupCols.map(col) :+
        (coalesce(col("_s").cast("double"), lit(0.0)) + noise)
          .as("dp_sum"): _*)
  }

  /** ε-differentially-private MEAN release: the budget splits ε/2 to a
    * clamped-sum release and ε/2 to a count release (sequential
    * composition), and the mean is their ratio with the noisy count
    * floored at 1 (a non-positive noisy denominator would flip the
    * sign or divide by zero — the standard guard; it costs no privacy,
    * post-processing is free). The two draws come from DISTINCT salted
    * seeds (`seed#sum`, `seed#cnt`) so they are independent — one
    * shared draw would leak the ratio structure. Count counts the rows
    * whose value is non-NULL (the rows that enter the sum).
    */
  def dpMeans(df: DataFrame, groupCols: Seq[String], valueCol: String,
              lo: Double, hi: Double, epsilon: Double,
              seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(hi > lo, s"clamp bounds must satisfy lo < hi, got [$lo, $hi]")
    require(groupCols.nonEmpty, "dpMeans needs at least one group column")
    require(seed.nonEmpty, "an empty seed defeats the keyed-draw contract")
    val half = epsilon / 2.0
    val noiseSum = laplaceNoise(keyedUniform(seed + "#sum", groupCols),
      (hi - lo) / half)
    val noiseCnt = laplaceNoise(keyedUniform(seed + "#cnt", groupCols),
      1.0 / half)
    df.groupBy(groupCols.map(col): _*)
      .agg(clampedSum(valueCol, lo, hi).as("_s"),
        count(col(valueCol)).as("_n"))
      .select(groupCols.map(col) :+
        ((coalesce(col("_s").cast("double"), lit(0.0)) + noiseSum) /
          greatest(col("_n").cast("double") + noiseCnt, lit(1.0)))
          .as("dp_mean"): _*)
  }
}
