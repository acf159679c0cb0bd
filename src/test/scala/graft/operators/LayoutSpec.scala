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
}
