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
  * Shape: the requested columns UNPIVOT into (col_name, key) rows inside
  * the scan (an explode over a struct array — no shuffle, no per-column
  * pass), then ONE aggregation tree computes counts, null counts, typed
  * min/max and the HLL register max together: a first
  * groupBy (col_name, bucket) level that map-side combines to at most
  * cols × (2^p + 1) rows per task, and a second level that collapses
  * buckets into the per-column profile, reusing
  * `Hll.estimateFromRegisters` for the cardinality estimate. EVERY
  * aggregation buffer in the hot level is fixed-width (longs) — carrying
  * rendered strings through it forces Spark's hash aggregate into its
  * sort-based fallback and renders every row (measured 5× the whole
  * query at sf0.1) — so `min_str`/`max_str` for ordered types are
  * RENDERED FROM the typed min/max after aggregation, and string-typed
  * columns get their min/max from a separate scan-side GLOBAL aggregate
  * (one row, column-pruned scan, no unpivot) that joins in as sentinel
  * `bucket = -1` rows. The intermediate state is ~cols × 4 KB regardless
  * of row count: the profile of a 100 TB table costs one unpivoted scan,
  * one pruned min/max scan, and a KB-scale shuffle.
  *
  * Exact NDV (`withExact = true`) adds a count_distinct pass — the gate
  * runs it so estimate accuracy is visible next to truth (the
  * `evt_hll_users` convention); at scale leave it off.
  *
  * Per-type NDV keys, chosen so the DuckDB oracle replays the whole
  * profile exactly: integral → the value itself; timestamp → micros;
  * date → epoch days (all order-preserving, so their min/max double as
  * the typed `num_min`/`num_max` AND render into `min_str`/`max_str`);
  * string → the first 52 bits of md5 (the repo's engine-identical
  * hash-to-int recipe; not order-preserving, so strings keep
  * lexicographic min/max over the values themselves and report NULL
  * `num_min`/`num_max`). Floating/decimal/binary fall back to `xxhash64`
  * — deterministic within Spark, fine for production NDV, but not
  * SQL-replayable, so the oracle gate covers the replayable types; their
  * min/max ride the string sentinel path (lexicographic over renders).
  */
object Profiler {

  private val P = 12

  private def vtypeOf(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "long"
    case TimestampType => "micros"
    case DateType => "days"
    case StringType => "str"
    case _ => "hash"
  }

  private def ndvKey(c: Column, dt: DataType): Column = vtypeOf(dt) match {
    case "long" => c.cast("long")
    case "micros" => unix_micros(c)
    case "days" => datediff(c, lit("1970-01-01").cast("date")).cast("long")
    case "str" => conv(substring(md5(c), 1, 13), 16, 10).cast("long")
    case _ => xxhash64(c)
  }

  private def ordered(vtype: Column): Column =
    vtype.isin("long", "micros", "days")

  private def checkCols(df: DataFrame, cols: Seq[String]): Map[String, DataType] = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(byName.contains(c), s"no such column: $c"))
    byName
  }

  /** The unpivoted (col_name, vtype, k) rows — one scan, fixed-width. */
  private def unpivot(df: DataFrame, cols: Seq[String]): DataFrame = {
    val byName = checkCols(df, cols)
    val entries = cols.map { name =>
      val dt = byName(name)
      struct(lit(name).as("col_name"), lit(vtypeOf(dt)).as("vtype"),
        ndvKey(col(name), dt).as("k"))
    }
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.vtype").as("vtype"),
        col("e.k").as("k"))
  }

  /** Level 1: per (column, register) — map-side combines to
    * <= cols x (m + 2) rows per task, every statistic on one shuffle,
    * every aggregation buffer fixed-width. String/hash columns'
    * lexicographic min/max arrive as `bucket = -1` sentinel rows from a
    * scan-side global aggregate (cnt = 0, so counts are untouched).
    * This frame is the profiler's MERGEABLE state: max(rho) / sum(cnt) /
    * min-max over any union of level-1 frames is the level-1 frame of
    * the concatenated data (`mergeLvl1`), which is what the streaming
    * maintenance below persists per batch.
    */
  private def level1(df: DataFrame, cols: Seq[String]): DataFrame = {
    val byName = checkCols(df, cols)
    val kv = unpivot(df, cols)
    val h = splitmix64(col("k"))
    val bucket = when(col("k").isNotNull,
      shiftrightunsigned(h, 64 - P))
    val rho = when(col("k").isNotNull,
      least(leading_zeros64(shiftleft(h, P)) + 1, lit(64 - P + 1)))
    val registers = kv
      .select(col("col_name"), col("vtype"), bucket.as("bucket"),
        rho.as("rho"), col("k"))
      .groupBy(col("col_name"), col("vtype"), col("bucket"))
      .agg(max(col("rho")).as("rho"),
        count(lit(1)).as("cnt"),
        min(when(ordered(col("vtype")), col("k"))).as("kmn"),
        max(when(ordered(col("vtype")), col("k"))).as("kmx"))
      .withColumn("mn", lit(null).cast("string"))
      .withColumn("mx", lit(null).cast("string"))
      .select("col_name", "vtype", "bucket", "rho", "cnt", "kmn", "kmx",
        "mn", "mx")

    val strCols = cols.filter(c => !ordersByKey(byName(c)))
    if (strCols.isEmpty) registers
    else {
      // one global-aggregate row over a column-pruned scan; reshaped to
      // sentinel rows without touching the driver
      val aggs = strCols.flatMap(c => Seq(
        min(col(c).cast("string")).as(s"__mn_$c"),
        max(col(c).cast("string")).as(s"__mx_$c")))
      val sentinels = df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(strCols.map(c =>
          struct(lit(c).as("col_name"),
            lit(vtypeOf(byName(c))).as("vtype"),
            lit(-1L).as("bucket"),
            lit(null).cast("int").as("rho"),
            lit(0L).as("cnt"),
            lit(null).cast("long").as("kmn"),
            lit(null).cast("long").as("kmx"),
            col(s"__mn_$c").as("mn"),
            col(s"__mx_$c").as("mx"))): _*)).as("e"))
        .select(col("e.*"))
      registers.unionByName(sentinels)
    }
  }

  private def ordersByKey(dt: DataType): Boolean = vtypeOf(dt) match {
    case "long" | "micros" | "days" => true
    case _ => false
  }

  /** The level-1 merge algebra, keyed by `keys` (adds `_batch_id` during
    * compaction so the normalized partition column survives).
    */
  private def mergeLvl1(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max(col("rho")).as("rho"), sum(col("cnt")).as("cnt"),
        min(col("kmn")).as("kmn"), max(col("kmx")).as("kmx"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** Level 2: collapse a level-1 frame into the per-column profile —
    * ordered types render their typed min/max into `min_str`/`max_str`
    * here, AFTER aggregation (cols rows, not data rows).
    */
  private def collapse(lvl1: DataFrame): DataFrame = {
    val basic = lvl1.groupBy(col("col_name"), col("vtype"))
      .agg(sum(col("cnt")).as("n_rows"),
        coalesce(sum(when(col("bucket").isNull, col("cnt"))), lit(0L))
          .as("n_null"),
        min(col("kmn")).as("num_min"), max(col("kmx")).as("num_max"),
        min(col("mn")).as("smn"), max(col("mx")).as("smx"))
      .withColumn("min_str",
        when(col("vtype") === "long", col("num_min").cast("string"))
          .when(col("vtype") === "micros",
            timestamp_micros(col("num_min")).cast("string"))
          .when(col("vtype") === "days",
            date_add(lit("1970-01-01").cast("date"),
              col("num_min").cast("int")).cast("string"))
          .otherwise(col("smn")))
      .withColumn("max_str",
        when(col("vtype") === "long", col("num_max").cast("string"))
          .when(col("vtype") === "micros",
            timestamp_micros(col("num_max")).cast("string"))
          .when(col("vtype") === "days",
            date_add(lit("1970-01-01").cast("date"),
              col("num_max").cast("int")).cast("string"))
          .otherwise(col("smx")))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("min_str"), col("max_str"), col("num_min"), col("num_max"))
    val est = Hll.estimateFromRegisters(
      lvl1.filter(col("bucket") >= 0)
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
      Seq("col_name", "vtype", "bucket")))

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
      df => mergeLvl1(df, Seq("col_name", "vtype", "bucket", "_batch_id"))
        .select(df.columns.map(col): _*))
}
