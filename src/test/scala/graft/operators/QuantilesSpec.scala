package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scalar reference for the bucket/upper-bound integer math. */
  private def refBucket(v: Long, m: Int): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val sub = if (e >= m) (v - (1L << e)) / (1L << (e - m))
              else ((v - (1L << e)) << m) / (1L << e)
    (e.toLong << m) + sub
  }
  private def refUpper(bucket: Long, m: Int): Long = {
    val e = (bucket >>> m).toInt
    val sub = bucket & ((1L << m) - 1)
    val p = 1L << e
    if (e >= m) p - 1 + (sub + 1) * (1L << (e - m))
    else p + ((sub + 1) * p + (1L << m) - 1) / (1L << m) - 1
  }

  test("bucketOf/upperBoundOf match the scalar reference and bound the value") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = (Seq(1L, 2L, 3L, 31L, 32L, 33L, 63L, 64L, 65L,
      (1L << 40) - 1, 1L << 40, Long.MaxValue) ++
      (1 to 500).map(_ => math.abs(rnd.nextLong()) % (1L << 50) + 1)).distinct
    for (m <- Seq(1, 3, 5, 8)) {
      val got = vals.toDF("v")
        .select($"v", Quantiles.bucketOf($"v", m).as("b"))
        .withColumn("u", Quantiles.upperBoundOf($"b", m))
        .collect()
      got.foreach { r =>
        val (v, b, u) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(b == refBucket(v, m), s"bucket($v, m=$m)")
        assert(u == refUpper(b, m), s"upper($b, m=$m)")
        assert(v <= u, s"v=$v above its bucket bound $u (m=$m)")
        // bias-high bound: one sub-bucket width
        assert(u - v <= math.max(1L, v >> m), s"v=$v u=$u overshoots (m=$m)")
      }
    }
  }

  test("bucket upper bounds are strictly increasing in bucket order") {
    // total order on buckets must equal total order on ranges, or the
    // cumulative-sum rank pick is meaningless
    import spark.implicits._
    val m = 5
    val bounds = (1L to 5000L).toDF("v")
      .select(Quantiles.bucketOf($"v", m).as("b")).distinct()
      .withColumn("u", Quantiles.upperBoundOf($"b", m))
      .orderBy($"b").collect().map(r => (r.getLong(0), r.getLong(1)))
    bounds.sliding(2).foreach { case Array((b1, u1), (b2, u2)) =>
      assert(u1 < u2, s"bounds not increasing: bucket $b1 -> $u1, $b2 -> $u2")
    }
  }

  test("merged histogram equals the one-shot histogram exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 20000).map { i =>
      (if (i % 3 == 0) "a" else "b", math.abs(rnd.nextLong()) % 100000 + 1)
    }
    val df = rows.toDF("grp", "v")
    val Array(h1, h2) = Array(df.filter($"v" % 2 === 0), df.filter($"v" % 2 === 1))
      .map(d => Quantiles.histogram(d, Seq("grp"), "v"))
    val merged = Quantiles.mergeHistograms(h1.unionByName(h2), Seq("grp"))
      .orderBy($"grp", $"bucket").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val oneShot = Quantiles.histogram(df, Seq("grp"), "v")
      .orderBy($"grp", $"bucket").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(merged.toSeq == oneShot.toSeq)
  }

  test("quantile estimates sit at/above the exact quantile within one bucket width") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // lognormal-ish positive longs — a latency-shaped distribution
    val vals = (1 to 50000).map(_ => math.max(1L, math.exp(rnd.nextGaussian() * 1.5 + 6).toLong))
    val df = vals.map(("all", _)).toDF("grp", "v")
    val qs = Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99)
    val got = Quantiles.quantiles(df, Seq("grp"), "v", qs).collect().head
    val sorted = vals.sorted
    def exact(q: Double): Long = sorted((math.ceil(q * vals.size) - 1).toInt)
    Seq(0.5 -> got.getLong(2), 0.95 -> got.getLong(3), 0.99 -> got.getLong(4))
      .foreach { case (q, est) =>
        val ex = exact(q)
        assert(est >= ex, s"q=$q est=$est below exact $ex (estimates bias high)")
        assert(est - ex <= math.max(1L, (ex >> Quantiles.DefaultSubBucketBits) + 1),
          s"q=$q est=$est too far above exact $ex")
      }
    assert(got.getLong(1) == vals.size, "n must be the total count")
  }

  test("values below 1 and NULLs are excluded like a filtered exact percentile") {
    import spark.implicits._
    val df = Seq(Some(5L), Some(0L), Some(-3L), None, Some(7L))
      .map(("g", _)).toDF("grp", "v")
    val h = Quantiles.histogram(df, Seq("grp"), "v")
    assert(h.agg(sum($"cnt")).collect().head.getLong(0) == 2)
  }
}
