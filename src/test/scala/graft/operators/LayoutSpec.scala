package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zValue Column math matches the scalar reference interleave") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (12345L, 67890L), (1L << 30, 1L << 30),
      (0xFFFFFFFFL, 5L)) // high bits beyond 31 are masked off
    val got = cases.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b").as("z")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == Layout.zValueRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
      assert(r.getLong(2) >= 0L, "62-bit result must stay non-negative")
    }
    // interleave is order-preserving per dimension at fixed other dim
    assert(Layout.zValueRef(5, 9) < Layout.zValueRef(6, 9))
    assert(Layout.zValueRef(5, 9) < Layout.zValueRef(5, 10))
  }

  test("z-ordered files prune on BOTH dimensions; time-sorted on one") {
    import spark.implicits._
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"user_id",
        expr("unix_micros(ts) div 60000000").as("minute"))
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val tDir = java.nio.file.Files.createTempDirectory("tsort").toString
    try {
      Layout.zorderBy(ev, "user_id", "minute", nFiles).drop("_z")
        .write.mode("overwrite").parquet(zDir)
      ev.repartitionByRange(nFiles, $"minute").sortWithinPartitions($"minute")
        .write.mode("overwrite").parquet(tDir)
      def filesTouched(dir: String, cond: org.apache.spark.sql.Column): Long =
        spark.read.parquet(dir).filter(cond)
          .select(input_file_name()).distinct().count()
      val user = ev.select($"user_id").head.getLong(0)
      val minLo = ev.agg(min($"minute")).head.getLong(0)
      // one user's rows: clustered under z-order, scattered under t-sort
      val zUser = filesTouched(zDir, $"user_id" === user)
      val tUser = filesTouched(tDir, $"user_id" === user)
      assert(zUser < tUser && zUser <= nFiles / 2,
        s"zorder=$zUser tsort=$tUser of $nFiles")
      // a narrow time slice still prunes under z-order (not ALL files)
      val zTime = filesTouched(zDir,
        $"minute".between(minLo, minLo + 30))
      assert(zTime < nFiles, s"time-slice touched all $nFiles z files")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(zDir))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tDir))
    }
  }

  test("the parquet READER skips z-pruned row groups: scan metrics, both dimensions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val ev = graft.Tables(spark, "/root/testdata/sf0.01", "events")
      .select($"event_id", $"user_id",
        expr("unix_micros(ts) div 60000000").as("minute"))
    val nFiles = 16
    val total = ev.count()
    val zDir = java.nio.file.Files.createTempDirectory("zorder_m").toString
    val tDir = java.nio.file.Files.createTempDirectory("tsort_m").toString
    try {
      Layout.zorderBy(ev, "user_id", "minute", nFiles).drop("_z")
        .write.mode("overwrite").parquet(zDir)
      ev.repartitionByRange(nFiles, $"minute").sortWithinPartitions($"minute")
        .write.mode("overwrite").parquet(tDir)
      // input_file_name() (the locality test above) counts files holding
      // matching ROWS; this measures what the READER actually touched —
      // the scan's numOutputRows is the row count of UNSKIPPED row groups
      // (footer min/max stats + pushed filter), before Spark's re-filter
      def scanRows(dir: String, cond: org.apache.spark.sql.Column): Long = {
        val df = spark.read.parquet(dir).filter(cond)
        df.collect()
        val scan = df.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }.head
        assert(scan.metadata("PushedFilters") != "[]",
          "the point filter must reach the parquet scan")
        scan.metrics("numOutputRows").value
      }
      val user = ev.select($"user_id").head.getLong(0)
      val minLo = ev.agg(min($"minute")).head.getLong(0)
      // point filter on the USER dimension: z-order skips most row
      // groups; the time-sorted layout reads ~everything (users are
      // scattered through every time range)
      val zUser = scanRows(zDir, $"user_id" === user)
      val tUser = scanRows(tDir, $"user_id" === user)
      assert(zUser * 2 <= tUser,
        s"z-order must at least halve the reader's materialized rows: " +
          s"z=$zUser vs t-sorted=$tUser of $total")
      assert(tUser > total / 2,
        s"time-sorted control unexpectedly pruned ($tUser of $total) — " +
          "the comparison is vacuous")
      // point filter on the TIME dimension: z-order still skips (the
      // interleave keeps minute locality too — the whole point vs a
      // single-dimension sort)
      val zTime = scanRows(zDir, $"minute".between(minLo, minLo + 30))
      assert(zTime < total,
        s"z-ordered reader materialized every row for a narrow time slice")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(zDir))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tDir))
    }
  }
}
