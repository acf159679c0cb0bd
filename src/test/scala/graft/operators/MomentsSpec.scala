package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MomentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches a scalar reference on a known line y = 3x + 7 with noise") {
    import spark.implicits._
    val pts = (1L to 1000L).map(i => ("g", i, 3 * i + 7 + (i % 5) - 2))
    val got = Moments.bivariateStats(pts.toDF("g", "x", "y"),
      Seq("g"), "x", "y").head
    // scalar moments
    val n = pts.size.toDouble
    val sx = pts.map(_._2).sum.toDouble
    val sy = pts.map(_._3).sum.toDouble
    val sxy = pts.map(p => p._2 * p._3).sum.toDouble
    val sxx = pts.map(p => p._2 * p._2).sum.toDouble
    val syy = pts.map(p => p._3 * p._3).sum.toDouble
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    assert(got.getAs[Long]("n") == 1000L)
    assert(got.getAs[Double]("corr") == num / math.sqrt(denx * deny))
    assert(got.getAs[Double]("slope") == num / denx)
    assert(got.getAs[Double]("intercept") ==
      (sy - (num / denx) * sx) / n)
    // near-perfect line: slope ~3, intercept ~7, r2 ~1
    assert(math.abs(got.getAs[Double]("slope") - 3.0) < 0.01)
    assert(math.abs(got.getAs[Double]("intercept") - 7.0) < 2.5)
    assert(got.getAs[Double]("r2") > 0.999)
  }

  test("bit-identical across partition layouts (the exactness claim)") {
    import spark.implicits._
    val pts = (0L until 20000L).map(i =>
      (s"g${i % 3}", i % 97, (i * 31) % 1009))
    val df = pts.toDF("g", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      Moments.bivariateStats(d, Seq("g"), "x", "y")
        .collect().map(r => (r.getString(0), r.getAs[Double]("corr"),
          r.getAs[Double]("slope"), r.getAs[Double]("intercept"))).sortBy(_._1).toSeq
    assert(run(df.repartition(2)) == run(df.repartition(31, col("y"))))
  }

  test("maintained moment table: stats == one-shot, replay-safe, compaction-convergent") {
    import spark.implicits._
    val pts = (0L until 8000L).map(i => (s"g${i % 2}", i % 97, (i * 13) % 1009))
    val df = pts.toDF("g", "x", "y")
    val a = df.filter($"x" % 2 === 0)
    val b = df.filter($"x" % 2 === 1)
    val salt = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val table = s"graft_mom_spec_$salt"
    val tmp = java.nio.file.Files.createTempDirectory(s"mom_$salt").toString
    def read() = Moments.statsFromTable(spark, table, Seq("g"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Double]("corr"), r.getAs[Double]("slope"))).sortBy(_._1).toSeq
    try {
      Moments.mergeBatch(a, Seq("g"), "x", "y", table, s"$tmp/t", 0L)
      Moments.mergeBatch(b, Seq("g"), "x", "y", table, s"$tmp/t", 1L)
      val oneShot = Moments.bivariateStats(df, Seq("g"), "x", "y")
        .collect().map(r => (r.getString(0), r.getAs[Long]("n"),
          r.getAs[Double]("corr"), r.getAs[Double]("slope"))).sortBy(_._1).toSeq
      assert(read() == oneShot)
      // replay of an already-landed batch: dynamic overwrite, no doubling
      Moments.mergeBatch(b, Seq("g"), "x", "y", table, s"$tmp/t", 1L)
      assert(read() == oneShot)
      Moments.compactMoments(spark, table, upToBatchId = 1L, Seq("g"))
      assert(read() == oneShot)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("degenerate groups yield NULL statistics, not NaN") {
    import spark.implicits._
    val df = Seq(("flat_x", 5L, 1L), ("flat_x", 5L, 9L),
      ("flat_y", 1L, 4L), ("flat_y", 2L, 4L),
      ("one", 3L, 3L)).toDF("g", "x", "y")
    val rows = Moments.bivariateStats(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("flat_x").isNullAt(rows("flat_x").fieldIndex("corr")))
    assert(rows("flat_x").isNullAt(rows("flat_x").fieldIndex("slope")))
    assert(rows("flat_y").isNullAt(rows("flat_y").fieldIndex("corr")))
    // flat_y still has x variance: slope is defined (0)
    assert(rows("flat_y").getAs[Double]("slope") == 0.0)
    assert(rows("one").isNullAt(rows("one").fieldIndex("corr")))
  }

  test("anticorrelation and NULL exclusion") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long, java.lang.Long)](
      ("g", 1L, 10L), ("g", 2L, 8L), ("g", 3L, 6L), ("g", 4L, 4L),
      ("g", null, 99L), ("g", 5L, null)).toDF("g", "x", "y")
    val r = Moments.bivariateStats(df, Seq("g"), "x", "y").head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("corr") == -1.0)
    assert(r.getAs[Double]("slope") == -2.0)
    assert(r.getAs[Double]("intercept") == 12.0)
  }
}
