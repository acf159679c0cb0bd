package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-9 second-wave operators (resampleWithFill,
  * Scd history/asOf, cumulativeEstimate, freq_items, Profiler,
  * Bucketing): times each on the given sf dir's tables replicated
  * `mult`× with shifted ids/users (disjoint copies, so cardinalities
  * scale with data — the CurationScaleProbe discipline). Evidence that
  * the claimed shapes hold at 10×/100×.
  *
  * Usage: Round9ScaleProbe <sfDir> [mult]   (default mult = 10)
  */
object Round9ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val ev0 = Tables(spark, dir, "events")
    val ev = (0 until mult).map { i =>
      ev0.select(($"event_id" + lit(i.toLong * 1000000000L)).as("event_id"),
        $"ts", ($"user_id" + lit(i.toLong * 1000000L)).as("user_id"),
        $"event_type", $"value", $"props")
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] events x$mult: ${ev.count()} rows, " +
      s"${ev.select($"user_id").distinct().count()} users")

    val daily = timed(s"resampleWithFill daily x$mult") {
      graft.operators.Temporal.resampleWithFill(
        ev.filter($"value".isNotNull), "user_id", "ts", "value",
        86400000000L).agg(count(lit(1)), sum(when($"n_obs" === 0, 1L))).head
    }
    println(s"[probe]   grid_rows=${daily.getLong(0)} gaps=${daily.getLong(1)}")

    val scd = timed(s"Scd.history + asOf x$mult") {
      val ch = ev.withColumn("op", graft.cdc.EventsAsChangeLog.opCol)
      val h = graft.cdc.Scd.history(ch, Seq("user_id"), "ts", "event_id", "op")
      graft.cdc.Scd.asOf(h, lit("2024-01-15 00:00:00").cast("timestamp"))
        .count()
    }
    println(s"[probe]   asof_rows=$scd")

    val cum = timed(s"cumulativeEstimate by day x$mult") {
      graft.operators.Hll.cumulativeEstimate(
        ev.withColumn("day", to_date($"ts")), "day", "user_id")
        .agg(max($"estimate")).head.getDouble(0)
    }
    println(f"[probe]   max_cum_est=$cum%.1f")

    val fi = timed(s"freq_items m=4096 x$mult (eviction at 100x)") {
      ev.agg(graft.functions.FreqItems.freq_items($"user_id", 4096).as("sk"))
        .select(size($"sk")).head.getInt(0)
    }
    println(s"[probe]   tracked=$fi")

    val prof = timed(s"Profiler 5 cols x$mult (no exact)") {
      graft.operators.Profiler.columnStats(ev,
        Seq("event_id", "user_id", "event_type", "ts", "props"))
        .agg(sum($"hll_ndv")).head.getDouble(0)
    }
    println(f"[probe]   ndv_sum=$prof%.1f")

    // bucketed join at scale: orders/lineitem replicated, 32 buckets
    val li0 = Tables(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val ord0 = Tables(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority")
    def rep(df: org.apache.spark.sql.DataFrame, key: String) =
      (0 until mult).map(i => df.withColumn(key,
        col(key) + lit(i.toLong * 1000000000L))).reduce(_ unionByName _)
    val tmp = java.nio.file.Files.createTempDirectory("r9_bkt").toString
    try {
      val buckets = math.max(32, 4 * mult) // keep scan parallelism >= cores
      // plain reference reads the SAME rows from plain parquet
      rep(li0, "l_orderkey").write.mode("overwrite").parquet(s"$tmp/li_plain")
      rep(ord0, "o_orderkey").write.mode("overwrite").parquet(s"$tmp/ord_plain")
      timed(s"bucketTable orders+lineitem x$mult (the one-time write, B=$buckets)") {
        graft.operators.Bucketing.bucketTable(
          spark.read.parquet(s"$tmp/li_plain"),
          "r9_probe_li", s"$tmp/li", "l_orderkey", buckets)
        graft.operators.Bucketing.bucketTable(
          spark.read.parquet(s"$tmp/ord_plain"),
          "r9_probe_ord", s"$tmp/ord", "o_orderkey", buckets)
      }
      def run3(label: String)(df: => org.apache.spark.sql.DataFrame): Long = {
        var n = 0L
        timed(label) { (1 to 3).foreach(_ => n = df.count()) }
        n
      }
      val j = run3(s"coLocatedJoin + per-key agg x$mult, 3 runs (exchange-free)") {
        graft.operators.Bucketing
          .coLocatedJoin(spark, "r9_probe_li", "r9_probe_ord",
            "l_orderkey", "o_orderkey")
          .groupBy($"o_orderkey").agg(count(lit(1)))
      }
      val p = run3(s"plain parquet join x$mult, 3 runs (reference)") {
        spark.read.parquet(s"$tmp/li_plain")
          .join(spark.read.parquet(s"$tmp/ord_plain"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderkey").agg(count(lit(1)))
      }
      println(s"[probe]   joined_keys=$j plain=$p")
    } finally {
      spark.sql("DROP TABLE IF EXISTS r9_probe_li")
      spark.sql("DROP TABLE IF EXISTS r9_probe_ord")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    spark.stop()
  }
}
