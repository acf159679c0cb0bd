package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("seeded splitmix64 equals hash(v + seed) with a wrapping add") {
    import spark.implicits._
    val seed = 3L * 0x9e3779b97f4a7c15L
    val vals = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 123456789L)
    val got = vals.toDF("v")
      .select($"v", graft.functions.SplitMix64.splitmix64Seeded($"v", seed).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) ==
        graft.functions.SplitMix64.hash(r.getLong(0) + seed))
    }
  }

  test("estimates never undercount, and are exact without collisions") {
    import spark.implicits._
    // zipf-ish stream: value v appears 101 - v times
    val stream = (1 to 100).flatMap(v => Seq.fill(101 - v)(v.toLong))
      .toDF("v")
    val exact = stream.groupBy($"v").agg(count(lit(1)).as("exact")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // tight sketch (w=2^4=16 << 100 distinct): collisions guaranteed,
    // but NEVER an undercount
    val tight = CountMin.pointEstimates(
      CountMin.sketch(stream, "v", depth = 4, widthLog2 = 4),
      stream, "v", depth = 4, widthLog2 = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (v, n) =>
      assert(tight(v) >= n, s"undercount for $v: ${tight(v)} < $n")
    }
    assert(exact.exists { case (v, n) => tight(v) > n },
      "w=16 over 100 values must collide somewhere")
    // wide sketch (w=2^16): no collisions expected -> exact everywhere
    val wide = CountMin.pointEstimates(
      CountMin.sketch(stream, "v", depth = 4, widthLog2 = 16),
      stream, "v", depth = 4, widthLog2 = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide == exact)
  }

  test("sketches merge by counter-wise sum") {
    import spark.implicits._
    val a = (1L to 500L).map(v => v % 37).toDF("v")
    val b = (1L to 300L).map(v => v % 53).toDF("v")
    val whole = CountMin.sketch(a.unionByName(b), "v")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = CountMin.mergeSketches(
      CountMin.sketch(a, "v").unionByName(CountMin.sketch(b, "v")))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == merged)
  }

  test("NULL values enter no counter and query as no row") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(1L), None, Some(2L))
      .map(_.map(Long.box).orNull).toDF("v")
    val sk = CountMin.sketch(df, "v")
    val clean = CountMin.sketch(Seq(1L, 1L, 2L).toDF("v"), "v")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sk.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap == clean, "NULLs must not inflate counters")
    assert(CountMin.pointEstimates(sk, df, "v").filter($"v".isNull).count() == 0)
  }

  test("absent values estimate from empty cells as >= 0 without failing") {
    import spark.implicits._
    val sk = CountMin.sketch(Seq(1L, 2L, 3L).toDF("v"), "v")
    val est = CountMin.pointEstimates(sk, Seq(999999L).toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(est.length == 1 && est.head._2 >= 0L)
  }

  test("join-size estimate: one-sided, exact when collision-free") {
    import spark.implicits._
    // fA = {1:3, 2:2, 3:1}, fB = {2:4, 3:2, 9:5} -> true join size
    // 2*4 + 1*2 = 10
    val a = (Seq.fill(3)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L)).toDF("v")
    val b = (Seq.fill(4)(2L) ++ Seq.fill(2)(3L) ++ Seq.fill(5)(9L)).toDF("v")
    // wide sketch over 4 distinct keys: collision-free with overwhelming
    // probability -> the estimate is EXACT, and it can never undercount
    val wide = CountMin.joinSizeEstimate(
      CountMin.sketch(a, "v", 4, 20), CountMin.sketch(b, "v", 4, 20),
      depth = 4).collect().head.getLong(0)
    assert(wide === 10L)
    // tight sketch: collisions may inflate, never deflate
    val tight = CountMin.joinSizeEstimate(
      CountMin.sketch(a, "v", 4, 2), CountMin.sketch(b, "v", 4, 2),
      depth = 4).collect().head.getLong(0)
    assert(tight >= 10L)
  }

  test("join-size estimate: disjoint key sets estimate toward zero") {
    import spark.implicits._
    val a = (1L to 50L).toDF("v")
    val b = (1000L to 1050L).toDF("v")
    val est = CountMin.joinSizeEstimate(
      CountMin.sketch(a, "v", 4, 16), CountMin.sketch(b, "v", 4, 16),
      depth = 4).collect().head.getLong(0)
    // true join size 0; wide rows make a zero-overlap row near-certain
    assert(est === 0L)
  }
}
