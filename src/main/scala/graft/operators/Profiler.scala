package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.SplitMix64.{leading_zeros64, splitmix64}

/** One-pass dataset profiler — the ANALYZE-style statistics collector a
  * 100 TB pipeline runs before planning anything else (sampling rates,
  * join strategies, partition counts, skew handling all start from
  * per-column row counts, null fractions, cardinalities and ranges).
  *
  * Shape: the requested columns UNPIVOT into (col_name, key, rendered)
  * rows inside the scan (an explode over a struct array — no shuffle,
  * no per-column pass), then ONE aggregation tree computes everything:
  * a first groupBy (col_name, hll_bucket) level that partial-aggregates
  * map-side to at most cols × (2^p + 1) rows per task — counts, null
  * counts, min/max, and the HLL register max all ride the same shuffle —
  * and a second level that collapses buckets into the per-column profile,
  * reusing `Hll.estimateFromRegisters` for the cardinality estimate. The
  * intermediate level is ~cols × 4 KB regardless of row count: the
  * profile of a 100 TB table costs one scan plus a KB-scale shuffle.
  *
  * Exact NDV (`withExact = true`) adds a count_distinct pass — the gate
  * runs it so estimate accuracy is visible next to truth (the
  * `evt_hll_users` convention); at scale leave it off.
  *
  * Per-type NDV keys, chosen so the DuckDB oracle replays the whole
  * profile exactly: integral → the value itself; timestamp → micros;
  * date → epoch days (all order-preserving, so their min/max double as
  * the typed `num_min`/`num_max`); string → the first 52 bits of md5
  * (the repo's engine-identical hash-to-int recipe; NOT order-preserving,
  * so strings report NULL num_min/num_max and rely on the lexicographic
  * `min_str`/`max_str`). Floating/decimal/binary fall back to
  * `xxhash64` — deterministic within Spark, fine for production NDV, but
  * not SQL-replayable, so the oracle gate covers the replayable types.
  * `min_str`/`max_str` are lexicographic over the rendered value in BOTH
  * engines (documented trade: one consistent type across the unpivot).
  */
object Profiler {

  private val P = 12
  private val M = 1 << P

  private def ndvKey(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => c.cast("long")
    case TimestampType => unix_micros(c)
    case DateType => datediff(c, lit("1970-01-01").cast("date")).cast("long")
    case StringType => conv(substring(md5(c), 1, 13), 16, 10).cast("long")
    case _ => xxhash64(c)
  }

  private def orderPreserving(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         TimestampType | DateType => true
    case _ => false
  }

  /** The unpivoted (col_name, k, v, ordered) rows — one scan. */
  private def unpivot(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(byName.contains(c), s"no such column: $c"))
    val entries = cols.map { name =>
      val dt = byName(name)
      struct(lit(name).as("col_name"),
        ndvKey(col(name), dt).as("k"),
        col(name).cast("string").as("v"),
        lit(orderPreserving(dt)).as("ordered"))
    }
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.k").as("k"),
        col("e.v").as("v"), col("e.ordered").as("ordered"))
  }

  /** Level 1: per (column, register) — map-side combines to
    * <= cols x (m + 1) rows per task, every statistic on one shuffle.
    * This frame is the profiler's MERGEABLE state: max(rho) / sum(cnt) /
    * min-max(mn, mx, kmn, kmx) over any union of level-1 frames is the
    * level-1 frame of the concatenated data (`mergeLvl1`), which is what
    * the streaming maintenance below persists per batch.
    */
  private def level1(df: DataFrame, cols: Seq[String]): DataFrame = {
    val kv = unpivot(df, cols)
    val h = splitmix64(col("k"))
    val bucket = when(col("k").isNotNull,
      shiftrightunsigned(h, 64 - P))
    val rho = when(col("k").isNotNull,
      least(leading_zeros64(shiftleft(h, P)) + 1, lit(64 - P + 1)))
    kv.select(col("col_name"), bucket.as("bucket"), rho.as("rho"),
        col("k"), col("v"), col("ordered"))
      .groupBy(col("col_name"), col("bucket"))
      .agg(max(col("rho")).as("rho"),
        count(lit(1)).as("cnt"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        min(when(col("ordered"), col("k"))).as("kmn"),
        max(when(col("ordered"), col("k"))).as("kmx"))
  }

  /** The level-1 merge algebra, keyed by `keys` (adds `_batch_id` during
    * compaction so the normalized partition column survives).
    */
  private def mergeLvl1(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max(col("rho")).as("rho"), sum(col("cnt")).as("cnt"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"),
        min(col("kmn")).as("kmn"), max(col("kmx")).as("kmx"))

  /** Level 2: collapse a level-1 frame into the per-column profile. */
  private def collapse(lvl1: DataFrame): DataFrame = {
    val basic = lvl1.groupBy(col("col_name"))
      .agg(sum(col("cnt")).as("n_rows"),
        coalesce(sum(when(col("bucket").isNull, col("cnt"))), lit(0L))
          .as("n_null"),
        min(col("mn")).as("min_str"), max(col("mx")).as("max_str"),
        min(col("kmn")).as("num_min"), max(col("kmx")).as("num_max"))
    val est = Hll.estimateFromRegisters(
      lvl1.filter(col("bucket").isNotNull)
        .select(col("col_name"), col("bucket"), col("rho")),
      Seq("col_name"), P)
      .select(col("col_name"), round(col("estimate"), 4).as("hll_ndv"))
    basic.join(est, Seq("col_name"), "left")
      .withColumn("hll_ndv", coalesce(col("hll_ndv"), lit(0.0)))
  }

  /** Per-column profile of `cols`: (col_name, n_rows, n_null, hll_ndv
    * [, ndv_exact], min_str, max_str, num_min, num_max).
    */
  def columnStats(df: DataFrame, cols: Seq[String],
                  withExact: Boolean = false): DataFrame = {
    // tiny; materialized once and shared by the two level-2 consumers
    val lvl1 = level1(df, cols).localCheckpoint(true)
    val joined = collapse(lvl1)
    if (!withExact) joined
    else joined.join(
      unpivot(df, cols).filter(col("k").isNotNull)
        .groupBy(col("col_name"))
        .agg(count_distinct(col("k")).as("ndv_exact")),
      Seq("col_name"), "left")
      .withColumn("ndv_exact", coalesce(col("ndv_exact"), lit(0L)))
  }

  /** STREAMING profile maintenance — the `BatchTables` state discipline
    * (HLL registers, CMS counters, quantile histograms) applied to the
    * profiler's level-1 state: each batch's (column, register) rows land
    * in their own `_batch_id` partition (dynamic overwrite → replay-safe,
    * exactly-once), reads merge at query time, and compaction folds
    * history into one ~cols x 4 KB partition. `profileFromTable` then
    * reports the profile of EVERYTHING the table has absorbed without
    * rescanning any raw data. Exact NDV is deliberately absent here —
    * registers are the only cardinality state a stream can keep.
    */
  def mergeBatch(batch: DataFrame, cols: Seq[String], table: String,
                 path: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val l1 = level1(batch, cols).withColumn("_batch_id", lit(batchId))
    BatchTables.ensureBatchTable(l1.limit(0), table, path)
    BatchTables.withDynamicOverwrite(spark) {
      l1.write.mode("overwrite").insertInto(table)
    }
  }

  /** The maintained table's profile over all absorbed batches. */
  def profileFromTable(spark: org.apache.spark.sql.SparkSession,
                       table: String): DataFrame =
    collapse(mergeLvl1(spark.table(table).drop("_batch_id"),
      Seq("col_name", "bucket")))

  /** Fold batches `0..upToBatchId` into one consolidated partition via
    * the level-1 merge algebra. The count/min/max merge is NOT
    * duplication-idempotent (sums double-count), so like CMS the
    * crash window between the consolidated insert and the source sweep
    * shows inflated counts until the convergence re-run; estimates from
    * the register half are unaffected (max-merge).
    */
  def compactProfile(spark: org.apache.spark.sql.SparkSession,
                     table: String, upToBatchId: Long): (Int, Int) =
    BatchTables.compactBatchPartitions(spark, table, upToBatchId,
      df => mergeLvl1(df, Seq("col_name", "bucket", "_batch_id"))
        .select(df.columns.map(col): _*))
}
