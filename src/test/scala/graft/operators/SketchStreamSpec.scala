package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming sketch maintenance (`Hll.mergeBatch` / `CountMin.mergeBatch`):
  * the dedup-gate state discipline applied to mergeable sketches — per-
  * batch partitions, dynamic-overwrite replay safety, read-time merge,
  * and compaction to a single consolidated partition whose estimates are
  * unchanged.
  */
class SketchStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(ids: Range, tag: String) = {
    import spark.implicits._
    ids.map(i => (tag, i.toLong)).toDF("grp", "uid")
  }

  test("HLL registers maintained across AvailableNow batches equal the one-shot estimate; replay is byte-identical") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("hll_stream").toString
    val table = "graft_hll_stream_regs"
    val srcDir = s"$tmp/src"
    val ckpt = s"$tmp/ckpt"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      def runBatchFile(df: org.apache.spark.sql.DataFrame): Unit = {
        df.coalesce(1).write.mode("append").parquet(srcDir)
        val q = spark.readStream.schema("grp STRING, uid LONG").parquet(srcDir)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            Hll.mergeBatch(b, Seq("grp"), "uid", table, s"$tmp/regs", id)
            ()
          }.start()
        q.awaitTermination()
      }
      val b0 = rows(0 until 3000, "a").unionByName(rows(0 until 500, "b"))
      val b1 = rows(1500 until 6000, "a").unionByName(rows(200 until 900, "b"))
      runBatchFile(b0)
      runBatchFile(b1)

      def tableEstimates() = Hll.estimateFromTable(spark, table, Seq("grp"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val oneShot = Hll.estimate(b0.unionByName(b1), Seq("grp"), "uid")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val streamed = tableEstimates()
      assert(streamed == oneShot,
        s"maintained-table estimate must equal one-shot: $streamed vs $oneShot")

      // crash replay of batch 1: same rows, same batch id — the dynamic
      // overwrite must leave table CONTENTS bit-identical (an append would
      // not change the estimate — max is idempotent — so assert contents)
      def contents() = spark.table(table)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
          r.getLong(3))).sortBy(t => (t._1, t._2, t._4)).toSeq
      val before = contents()
      Hll.mergeBatch(b1, Seq("grp"), "uid", table, s"$tmp/regs", batchId = 1L)
      assert(contents() == before, "replay must not change register rows")
      assert(tableEstimates() == oneShot)

      // compaction: history folds to ONE negative partition, estimates
      // unchanged, state bounded by groups x 2^p
      Hll.compactRegisters(spark, table, upToBatchId = 1L)
      val parts = spark.table(table).select($"_batch_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(parts == Set(-2L), s"expected one consolidated partition, got $parts")
      assert(tableEstimates() == oneShot)
      assert(spark.table(table).count() <= 2L * (1L << 12))

      // crash-window idempotence (the max-merge asymmetry the scaladoc
      // claims): a leftover source partition alongside the consolidated
      // one must not move the estimate; the convergence re-run sweeps it
      Hll.mergeBatch(b0, Seq("grp"), "uid", table, s"$tmp/regs", batchId = 0L)
      assert(tableEstimates() == oneShot,
        "duplicate registers must not perturb a max-merged estimate")
      Hll.compactRegisters(spark, table, upToBatchId = 1L)
      assert(spark.table(table).select($"_batch_id").distinct()
        .collect().map(_.getLong(0)).toSet == Set(-2L))
      assert(tableEstimates() == oneShot)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("CMS counters maintained per batch equal the one-shot sketch; replay never double-counts") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("cms_stream").toString
    val table = "graft_cms_stream_sketch"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val b0 = (1L to 500L).map(v => v % 37).toDF("v")
      val b1 = (1L to 300L).map(v => v % 53).toDF("v")
      CountMin.mergeBatch(b0, "v", table, s"$tmp/sk", batchId = 0L)
      CountMin.mergeBatch(b1, "v", table, s"$tmp/sk", batchId = 1L)

      def merged() = CountMin.sketchFromTable(spark, table)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val oneShot = CountMin.sketch(b0.unionByName(b1), "v")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(merged() == oneShot)

      // replaying batch 1 must overwrite its partition, not add counters —
      // double-counting a replayed batch is the CMS failure mode
      CountMin.mergeBatch(b1, "v", table, s"$tmp/sk", batchId = 1L)
      assert(merged() == oneShot, "replay must not inflate counters")

      CountMin.compactSketch(spark, table, upToBatchId = 1L)
      assert(spark.table(table).select($"_batch_id").distinct()
        .collect().map(_.getLong(0)).toSet == Set(-2L))
      assert(merged() == oneShot)
      // steady state: one consolidated sketch, d x 2^widthLog2 max rows
      assert(spark.table(table).count() <= 4L * (1L << 10))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("quantile histograms maintained per batch equal the one-shot sketch; replay never double-counts") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("qtl_stream").toString
    val table = "graft_qtl_stream_hist"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val rnd = new scala.util.Random(31)
      def mk(n: Int, tag: String) =
        (1 to n).map(_ => (tag, math.abs(rnd.nextLong()) % 90000 + 1))
          .toDF("grp", "v")
      val b0 = mk(4000, "a").unionByName(mk(1000, "b"))
      val b1 = mk(2500, "a").unionByName(mk(1500, "b"))
      Quantiles.mergeBatch(b0, Seq("grp"), "v", table, s"$tmp/hist", batchId = 0L)
      Quantiles.mergeBatch(b1, Seq("grp"), "v", table, s"$tmp/hist", batchId = 1L)

      def merged() = Quantiles.histogramFromTable(spark, table, Seq("grp"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val oneShot = Quantiles.histogram(b0.unionByName(b1), Seq("grp"), "v")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(merged() == oneShot)

      val qs = Seq("p50" -> 0.5, "p99" -> 0.99)
      def tableQuantiles() = Quantiles.quantilesFromHistogram(
        Quantiles.histogramFromTable(spark, table, Seq("grp")), Seq("grp"), qs)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val oneShotQ = Quantiles.quantiles(b0.unionByName(b1), Seq("grp"), "v", qs)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(tableQuantiles() == oneShotQ)

      // replaying batch 1 must overwrite its partition, not add counters —
      // double-counting shifts every rank, same failure mode as CMS
      Quantiles.mergeBatch(b1, Seq("grp"), "v", table, s"$tmp/hist", batchId = 1L)
      assert(merged() == oneShot, "replay must not inflate counters")

      Quantiles.compactHistogram(spark, table, upToBatchId = 1L)
      assert(spark.table(table).select($"_batch_id").distinct()
        .collect().map(_.getLong(0)).toSet == Set(-2L))
      assert(merged() == oneShot)
      assert(tableQuantiles() == oneShotQ)
      // steady state: groups x 64*2^m max rows
      assert(spark.table(table).count() <= 2L * 64L * (1L << 5))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("column profiles maintained per batch equal the one-shot profile; replay never double-counts") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("prof_stream").toString
    val table = "graft_prof_stream_lvl1"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      def mk(ids: Range, tag: String) = {
        import spark.implicits._
        ids.map(i => (i.toLong, if (i % 11 == 0) null else s"$tag$i"))
          .toDF("id", "s")
      }
      val b0 = mk(0 until 2000, "a")
      val b1 = mk(1500 until 5000, "b")
      val cols = Seq("id", "s")
      Profiler.mergeBatch(b0, cols, table, s"$tmp/prof", batchId = 0L)
      Profiler.mergeBatch(b1, cols, table, s"$tmp/prof", batchId = 1L)

      def profile(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
            Option(r.get(5)), Option(r.get(6)), r.getDouble(7))).toMap
      val oneShot = profile(Profiler.columnStats(
        b0.unionByName(b1), cols, withExact = false)
        .select($"col_name", $"n_rows", $"n_null", $"min_str", $"max_str",
          $"num_min", $"num_max", $"hll_ndv"))
      def fromTable() = profile(Profiler.profileFromTable(spark, table)
        .select($"col_name", $"n_rows", $"n_null", $"min_str", $"max_str",
          $"num_min", $"num_max", $"hll_ndv"))
      assert(fromTable() == oneShot)

      // replaying batch 1 must overwrite its partition — double-counted
      // rows/registers are the failure mode (sum half is not idempotent)
      Profiler.mergeBatch(b1, cols, table, s"$tmp/prof", batchId = 1L)
      assert(fromTable() == oneShot, "replay must not inflate counts")

      Profiler.compactProfile(spark, table, upToBatchId = 1L)
      assert(spark.table(table).select($"_batch_id").distinct()
        .collect().map(_.getLong(0)).toSet == Set(-2L))
      assert(fromTable() == oneShot)
      // steady state: cols x (m + 1) max rows
      assert(spark.table(table).count() <= 2L * ((1L << 12) + 1))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("frequent-item summaries maintained per batch keep the SpaceSaving contract; no-eviction is exact") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("fi_stream").toString
    val table = "graft_fi_stream_summary"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      def zipf(top: Int, card: Int, salt: Int) = {
        val r = new scala.util.Random(salt)
        r.shuffle((1 to card).flatMap(i =>
          Seq.fill(top / i)(i.toLong)).toList).toDF("item")
      }
      // ---- exact regime: cardinality << m, summaries never fill ----
      val a0 = zipf(400, 50, 1)
      val a1 = zipf(600, 80, 2)
      FreqItemsState.mergeBatch(a0, "item", m = 256, table, s"$tmp/fi", 0L)
      FreqItemsState.mergeBatch(a1, "item", m = 256, table, s"$tmp/fi", 1L)
      def fromTable(m: Int) =
        FreqItemsState.summaryFromTable(spark, table, m)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
      val oneShot = a0.unionByName(a1)
        .agg(graft.functions.FreqItems.freq_items($"item", 256).as("sk"))
        .select(explode($"sk").as("e"))
        .select($"e.item", $"e.est", $"e.lb")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(fromTable(256) == oneShot,
        "no-eviction table summary must equal the one-shot summary exactly")
      assert(FreqItemsState.totalFromTable(spark, table) ==
        a0.count() + a1.count())

      // replaying batch 1 must overwrite, not double-count
      FreqItemsState.mergeBatch(a1, "item", m = 256, table, s"$tmp/fi", 1L)
      assert(fromTable(256) == oneShot, "replay must not inflate")

      // compaction folds to one partition; summary unchanged
      FreqItemsState.compactSummary(spark, table, upToBatchId = 1L, m = 256)
      assert(spark.table(table).select($"_batch_id").distinct()
        .collect().map(_.getLong(0)).toSet == Set(-2L))
      assert(fromTable(256) == oneShot)

      // ---- eviction regime: bounds + tracking guarantee survive ----
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      val b0 = zipf(3000, 700, 3)
      val b1 = zipf(2500, 900, 4)
      val m = 64
      FreqItemsState.mergeBatch(b0, "item", m, table, s"$tmp/fi2", 0L)
      FreqItemsState.mergeBatch(b1, "item", m, table, s"$tmp/fi2", 1L)
      val truth = (b0.unionByName(b1)).groupBy($"item").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val total = truth.values.sum
      val merged = fromTable(m)
      assert(merged.size == m)
      merged.foreach { case (item, (est, lb)) =>
        val t = truth(item)
        assert(lb <= t && t <= est, s"item $item: ($lb, $est) miss $t")
      }
      val frequent = truth.filter(_._2 > total / m).keySet
      assert(frequent.subsetOf(merged.keySet),
        s"missing frequent items: ${frequent -- merged.keySet}")
      // the guarantee survives compaction too
      FreqItemsState.compactSummary(spark, table, upToBatchId = 1L, m = m)
      val afterCompact = fromTable(m)
      afterCompact.foreach { case (item, (est, lb)) =>
        val t = truth(item)
        assert(lb <= t && t <= est,
          s"post-compaction item $item: ($lb, $est) miss $t")
      }
      assert(frequent.subsetOf(afterCompact.keySet))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}
