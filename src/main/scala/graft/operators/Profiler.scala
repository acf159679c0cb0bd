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

  /** Per-column profile of `cols`: (col_name, n_rows, n_null, hll_ndv
    * [, ndv_exact], min_str, max_str, num_min, num_max).
    */
  def columnStats(df: DataFrame, cols: Seq[String],
                  withExact: Boolean = false): DataFrame = {
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
    val kv = df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.k").as("k"),
        col("e.v").as("v"), col("e.ordered").as("ordered"))

    val h = splitmix64(col("k"))
    val bucket = when(col("k").isNotNull,
      shiftrightunsigned(h, 64 - P))
    val rho = when(col("k").isNotNull,
      least(leading_zeros64(shiftleft(h, P)) + 1, lit(64 - P + 1)))

    // level 1: per (column, register) — map-side combines to
    // <= cols x (m + 1) rows per task, every statistic on one shuffle
    val lvl1 = kv
      .select(col("col_name"), bucket.as("bucket"), rho.as("rho"),
        col("k"), col("v"), col("ordered"))
      .groupBy(col("col_name"), col("bucket"))
      .agg(max(col("rho")).as("rho"),
        count(lit(1)).as("cnt"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        min(when(col("ordered"), col("k"))).as("kmn"),
        max(when(col("ordered"), col("k"))).as("kmx"))
      .localCheckpoint(true) // tiny; shared by the two level-2 consumers

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

    val joined = basic.join(est, Seq("col_name"), "left")
      .withColumn("hll_ndv", coalesce(col("hll_ndv"), lit(0.0)))

    if (!withExact) joined
    else joined.join(
      kv.filter(col("k").isNotNull)
        .groupBy(col("col_name"))
        .agg(count_distinct(col("k")).as("ndv_exact")),
      Seq("col_name"), "left")
      .withColumn("ndv_exact", coalesce(col("ndv_exact"), lit(0L)))
  }
}
