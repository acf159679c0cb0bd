package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scalar replica of Quantiles.bucketOf for the reference model. */
  private def bucketOf(v: Long, m: Int = 5): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val p = 1L << e
    val sub = if (e >= m) (v - p) / (1L << (e - m)) else ((v - p) << m) / p
    (e.toLong << m) + sub
  }

  /** Scalar KS/TV reference over two value lists (single group). */
  private def refStats(a: Seq[Long], b: Seq[Long]): (Long, Long, Long) = {
    val ca = a.groupBy(bucketOf(_)).view.mapValues(_.size.toLong).toMap
    val cb = b.groupBy(bucketOf(_)).view.mapValues(_.size.toLong).toMap
    val keys = (ca.keySet ++ cb.keySet).toSeq.sorted
    val (nA, nB) = (a.size.toLong, b.size.toLong)
    var cumA = 0L; var cumB = 0L; var ks = 0L; var tv = 0L
    keys.foreach { k =>
      val (xa, xb) = (ca.getOrElse(k, 0L), cb.getOrElse(k, 0L))
      cumA += xa; cumB += xb
      ks = math.max(ks, math.abs(cumA * nB - cumB * nA))
      tv += math.abs(xa * nB - xb * nA)
    }
    (ks, tv, keys.size.toLong)
  }

  test("histogramDrift matches the scalar KS/TV reference exactly") {
    import spark.implicits._
    val a = (1L to 4000L).map(i => ("g", (i * 7) % 1000 + 1))
    val b = (1L to 3000L).map(i => ("g", (i * i) % 1500 + 1))
    val got = Drift.histogramDrift(a.toDF("g", "v"), b.toDF("g", "v"),
      Seq("g"), "v").head
    val (ks, tv, k) = refStats(a.map(_._2), b.map(_._2))
    assert(got.getAs[Long]("n_a") == 4000L)
    assert(got.getAs[Long]("n_b") == 3000L)
    assert(got.getAs[Long]("buckets") == k)
    assert(got.getAs[Long]("ks_num") == ks)
    assert(got.getAs[Long]("tv_num") == tv)
    assert(got.getAs[Double]("ks") == ks.toDouble / (4000d * 3000d))
    assert(got.getAs[Double]("tv") == tv.toDouble / (4000d * 3000d * 2d))
    assert(got.getAs[Double]("psi") > 0d)
  }

  test("identical snapshots drift by exactly zero (psi included)") {
    import spark.implicits._
    val x = (1L to 2000L).map(i => (s"g${i % 3}", i % 500 + 1)).toDF("g", "v")
    val rows = Drift.histogramDrift(x, x, Seq("g"), "v").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("ks_num") == 0L)
      assert(r.getAs[Long]("tv_num") == 0L)
      // equal counts and totals: every smoothed pA == pB, terms exactly 0
      assert(r.getAs[Double]("psi") == 0d)
    }
  }

  test("disjoint supports saturate: ks = 1, tv = 1") {
    import spark.implicits._
    val a = (1L to 100L).map(i => ("g", i)).toDF("g", "v")
    val b = (1L to 200L).map(i => ("g", i + 1000000L)).toDF("g", "v")
    val r = Drift.histogramDrift(a, b, Seq("g"), "v").head
    assert(r.getAs[Long]("ks_num") == 100L * 200L)
    assert(r.getAs[Long]("tv_num") == 2L * 100L * 200L)
    assert(r.getAs[Double]("ks") == 1d)
    assert(r.getAs[Double]("tv") == 1d)
  }

  test("a group present on one side only yields NULL statistics, not a division") {
    import spark.implicits._
    val a = Seq(("only_a", 5L), ("both", 9L)).toDF("g", "v")
    val b = Seq(("both", 9L)).toDF("g", "v")
    val rows = Drift.histogramDrift(a, b, Seq("g"), "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(rows("only_a").getAs[Long]("n_b") == 0L)
    assert(rows("only_a").isNullAt(rows("only_a").fieldIndex("ks")))
    assert(rows("only_a").isNullAt(rows("only_a").fieldIndex("tv")))
    assert(rows("only_a").isNullAt(rows("only_a").fieldIndex("psi")))
    assert(rows("both").getAs[Long]("tv_num") == 0L)
  }

  test("categoryDrift: census columns and NULL-category exclusion") {
    import spark.implicits._
    val a = Seq(("s", "en"), ("s", "en"), ("s", "de"), ("s", null)).toDF("g", "c")
    val b = Seq(("s", "en"), ("s", "fr"), ("s", "fr")).toDF("g", "c")
    val r = Drift.categoryDrift(a, b, Seq("g"), "c").head
    assert(r.getAs[Long]("n_a") == 3L) // NULL category excluded
    assert(r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("buckets") == 3L) // en, de, fr
    assert(r.getAs[Long]("cats_added") == 1L) // fr
    assert(r.getAs[Long]("cats_removed") == 1L) // de
    // tv_num: en |2*3-1*3|=3, de |1*3-0|=3, fr |0-2*3|=6 → 12
    assert(r.getAs[Long]("tv_num") == 12L)
    assert(r.getAs[Double]("tv") == 12d / (3d * 3d * 2d))
    assert(r.getAs[Double]("psi") > 0d && !r.getAs[Double]("psi").isInfinite)
  }

  test("driftFromTable == one-shot histogramDrift over the same rows") {
    import spark.implicits._
    val a = (0L until 6000L).map(i => (s"g${i % 2}", (i * 7) % 900 + 1)).toDF("g", "v")
    val b = (0L until 4000L).map(i => (s"g${i % 2}", (i * 11) % 1300 + 1)).toDF("g", "v")
    val salt = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val table = s"drift_spec_$salt"
    val tmp = java.nio.file.Files.createTempDirectory("driftspec").toString
    try {
      // side A split across two batches, side B one batch — the merge
      // must re-assemble A exactly before comparing
      Quantiles.mergeBatch(a.filter($"v" % 2 === 0), Seq("g"), "v",
        table, s"$tmp/h", batchId = 0L)
      Quantiles.mergeBatch(a.filter($"v" % 2 === 1), Seq("g"), "v",
        table, s"$tmp/h", batchId = 1L)
      Quantiles.mergeBatch(b, Seq("g"), "v", table, s"$tmp/h", batchId = 2L)
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[String]("g"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("buckets"), r.getAs[Long]("ks_num"),
          r.getAs[Long]("tv_num"))
      val fromTable = Drift.driftFromTable(spark, table, Seq("g"),
        Seq(0L, 1L), Seq(2L)).collect().map(key).sortBy(_._1).toSeq
      val oneShot = Drift.histogramDrift(a, b, Seq("g"), "v")
        .collect().map(key).sortBy(_._1).toSeq
      assert(fromTable == oneShot)
      intercept[IllegalArgumentException] {
        Drift.driftFromTable(spark, table, Seq("g"), Seq(0L, 1L), Seq(1L))
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("integer statistics are layout-invariant; psi stable to float-sum order") {
    import spark.implicits._
    val a = (0L until 30000L).map(i => (s"g${i % 4}", (i * 13) % 3000 + 1)).toDF("g", "v")
    val b = (0L until 20000L).map(i => (s"g${i % 4}", (i * 29) % 4000 + 1)).toDF("g", "v")
    def run(pa: org.apache.spark.sql.DataFrame, pb: org.apache.spark.sql.DataFrame) =
      Drift.histogramDrift(pa, pb, Seq("g"), "v").collect()
        .map(r => (r.getAs[String]("g"), r.getAs[Long]("ks_num"),
          r.getAs[Long]("tv_num"), r.getAs[Double]("psi")))
        .sortBy(_._1).toSeq
    val r1 = run(a.repartition(2), b.repartition(17, col("v")))
    val r2 = run(a.repartition(31, col("g")), b.repartition(3))
    assert(r1.map(t => (t._1, t._2, t._3)) == r2.map(t => (t._1, t._2, t._3)))
    r1.zip(r2).foreach { case (x, y) =>
      assert(math.abs(x._4 - y._4) < 1e-12)
    }
  }

  test("the 2^63 numerator bound is checked: over-bound groups error, never wrap") {
    import spark.implicits._
    // fabricated COUNT frames put a group over n_a*n_b >= 2^62 with two
    // rows per side — no data-sized input needed to hit the guard
    val big = 3_100_000_000L // 3.1e9 per side -> product 9.6e18 > 2^62
    val a = Seq(("g", 1L, big), ("g", 2L, big)).toDF("g", "bucket", "cnt")
    val b = Seq(("g", 1L, big), ("g", 2L, big)).toDF("g", "bucket", "cnt")
    val e = intercept[Exception] {
      Drift.driftFromCounts(a, b, Seq("g"), "bucket", ordered = true).collect()
    }
    val full = org.apache.commons.lang3.exception.ExceptionUtils.getStackTrace(e)
    assert(full.contains("Drift numerator overflow"), s"got: ${e.getMessage}")
    // under the bound the same shape still computes exactly
    val okN = 1_000_000_000L
    val a2 = Seq(("g", 1L, okN), ("g", 2L, okN)).toDF("g", "bucket", "cnt")
    val b2 = Seq(("g", 1L, 2L * okN), ("g", 2L, 0L)).toDF("g", "bucket", "cnt")
    val row = Drift.driftFromCounts(a2, b2, Seq("g"), "bucket", ordered = true)
      .head
    // d_1 = n*2n - 2n*2n = -2n^2; ks_num = 2e18 exactly
    assert(row.getAs[Long]("ks_num") == 2L * okN * okN)
  }
}
