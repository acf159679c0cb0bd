package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def profile(cols: Seq[String],
                      df: org.apache.spark.sql.DataFrame) =
    Profiler.columnStats(df, cols, withExact = true)
      .collect().map(r => r.getString(0) -> r).toMap

  test("counts, nulls, typed and lexicographic min/max, exact NDV") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(Timestamp.valueOf("2024-01-02 00:00:00"))),
      (2L, None, Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
      (10L, Some("b"), None),
      (10L, Some("a"), None))
      .toDF("id", "s", "t")
    val p = profile(Seq("id", "s", "t"), df)

    val id = p("id")
    assert(id.getAs[Long]("n_rows") == 4 && id.getAs[Long]("n_null") == 0)
    assert(id.getAs[Long]("ndv_exact") == 3)
    // ordered types: min/max_str RENDER the typed min/max (natural order,
    // not lexicographic — "10" beats "2" here)
    assert(id.getAs[String]("min_str") == "1" &&
      id.getAs[String]("max_str") == "10")
    assert(id.getAs[Long]("num_min") == 1L &&
      id.getAs[Long]("num_max") == 10L)

    val s = p("s")
    assert(s.getAs[Long]("n_null") == 1 && s.getAs[Long]("ndv_exact") == 2)
    assert(s.getAs[String]("min_str") == "a" &&
      s.getAs[String]("max_str") == "b")
    // md5 keys are not order-preserving: no typed min/max for strings
    assert(s.isNullAt(s.fieldIndex("num_min")) &&
      s.isNullAt(s.fieldIndex("num_max")))

    val t = p("t")
    assert(t.getAs[Long]("n_null") == 2 && t.getAs[Long]("ndv_exact") == 2)
    assert(t.getAs[Long]("num_min") ==
      Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000)
    assert(t.getAs[String]("min_str") == "2024-01-01 00:00:00" &&
      t.getAs[String]("max_str") == "2024-01-02 00:00:00")
  }

  test("all-null and empty inputs profile to zero, not an error") {
    import spark.implicits._
    val allNull = Seq[Option[Long]](None, None).toDF("x")
    val p = profile(Seq("x"), allNull)("x")
    assert(p.getAs[Long]("n_rows") == 2 && p.getAs[Long]("n_null") == 2)
    assert(p.getAs[Long]("ndv_exact") == 0 &&
      p.getAs[Double]("hll_ndv") == 0.0)
    val empty = profile(Seq("x"), allNull.filter(lit(false)))
    assert(empty.isEmpty) // no rows, no profile rows — caller sees zero
  }

  test("HLL estimate lands within the 1.04/sqrt(m) band on a real column") {
    val li = graft.Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val p = profile(Seq("l_orderkey", "l_returnflag"), li)
    for (c <- Seq("l_orderkey", "l_returnflag")) {
      val exact = p(c).getAs[Long]("ndv_exact").toDouble
      val est = p(c).getAs[Double]("hll_ndv")
      assert(math.abs(est - exact) <= math.max(4 * 1.04 / 64 * exact, 1.0),
        s"$c: est $est vs exact $exact")
    }
  }

  test("the profile's two consumers share ONE materialized level-1 — the " +
      "source is never rescanned") {
    val li = graft.Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val plan = Profiler.columnStats(li,
      Seq("l_orderkey", "l_returnflag"), withExact = false)
      .queryExecution.executedPlan.toString
    // level 1 (the single unpivoted scan + register aggregation) is
    // localCheckpoint-materialized at build time; both level-2 consumers
    // read the checkpointed rows, so the final plan carries NO file scan
    // at all — the parquet was read exactly once, during the checkpoint
    assert(!plan.contains("FileScan parquet"), plan.take(2000))
    assert("Scan ExistingRDD".r.findAllIn(plan).size == 2, plan.take(2000))
  }

  test("double columns fall back to the xxhash64 key deterministically") {
    import spark.implicits._
    val df = Seq(0.5, 0.5, 1.5, Double.NaN).toDF("d")
    val p1 = profile(Seq("d"), df)("d")
    val p2 = profile(Seq("d"), df)("d")
    assert(p1.getAs[Long]("ndv_exact") == 3)
    assert(p1.getAs[Double]("hll_ndv") == p2.getAs[Double]("hll_ndv"))
    assert(p1.isNullAt(p1.fieldIndex("num_min"))) // key not order-preserving
    // but min/max are TYPED doubles, not lexicographic renders ("10.5"
    // never sorts below "9.5"); Spark's max treats NaN as the greatest
    assert(p1.getAs[String]("min_str") == "0.5" &&
      p1.getAs[String]("max_str") == "NaN")
  }

  test("double min/max is numeric, and NULLs count as nulls, not a " +
      "phantom distinct value") {
    import spark.implicits._
    val df = Seq(Some(10.5), Some(9.5), None).toDF("d")
    val p = profile(Seq("d"), df)("d")
    // an unguarded xxhash64 maps NULL to its seed: n_null would read 0
    // and ndv_exact 3
    assert(p.getAs[Long]("n_rows") == 3 && p.getAs[Long]("n_null") == 1)
    assert(p.getAs[Long]("ndv_exact") == 2)
    assert(p.getAs[String]("min_str") == "9.5" &&
      p.getAs[String]("max_str") == "10.5")
  }

  test("decimal columns key through the unscaled long: exact NDV, typed " +
      "range, canonical rendering") {
    import spark.implicits._
    val df = Seq(Some("10.50"), Some("9.75"), Some("-0.05"), None)
      .toDF("raw")
      .select(col("raw").cast("decimal(12,2)").as("m"))
    val p = profile(Seq("m"), df)("m")
    assert(p.getAs[Long]("n_rows") == 4 && p.getAs[Long]("n_null") == 1)
    assert(p.getAs[Long]("ndv_exact") == 3)
    // num_min/num_max carry the UNSCALED value (cents here)
    assert(p.getAs[Long]("num_min") == -5L &&
      p.getAs[Long]("num_max") == 1050L)
    assert(p.getAs[String]("min_str") == "-0.05" &&
      p.getAs[String]("max_str") == "10.50")
  }

  test("decimal precision beyond a long's range is rejected up front") {
    import spark.implicits._
    val df = Seq("1.0").toDF("raw")
      .select(col("raw").cast("decimal(38,2)").as("m"))
    val e = intercept[IllegalArgumentException](profile(Seq("m"), df))
    assert(e.getMessage.contains("precision"))
  }

  test("profileDiff: census, null shift, ndv ratio, endpoint flags") {
    import spark.implicits._
    // A: id 1..10 (no nulls), label a/b; B: id 1..8 plus two null ids,
    // label a/b/c, and B alone carries `extra`
    val a = (1L to 10L).map(i =>
      (Some(i), if (i % 2 == 0) "a" else "b", i * 2)).toDF("id", "label", "gone")
    val b = ((1L to 8L).map(i =>
      (Some(i), Seq("a", "b", "c")(i.toInt % 3), i)) ++
      Seq((Option.empty[Long], "a", 0L), (Option.empty[Long], "b", 0L)))
      .toDF("id", "label", "extra")
    val d = Profiler.profileDiff(
        Profiler.columnStats(a, Seq("id", "label", "gone"), withExact = true),
        Profiler.columnStats(b, Seq("id", "label", "extra"), withExact = true))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(d.keySet == Set("id", "label", "gone", "extra"))
    assert(d("gone").getAs[String]("status") == "removed")
    assert(d("extra").getAs[String]("status") == "added")
    assert(d("extra").isNullAt(d("extra").fieldIndex("null_shift")))
    val id = d("id")
    assert(id.getAs[String]("status") == "common")
    assert(id.getAs[Long]("n_rows_a") == 10L && id.getAs[Long]("n_rows_b") == 10L)
    assert(id.getAs[Long]("n_null_a") == 0L && id.getAs[Long]("n_null_b") == 2L)
    assert(id.getAs[Double]("null_shift") == 2d / 10d - 0d)
    assert(id.getAs[Double]("ndv_a") == 10d && id.getAs[Double]("ndv_b") == 8d)
    assert(id.getAs[Double]("ndv_ratio") == 8d / 10d)
    assert(!id.getAs[Boolean]("min_changed")) // both min at 1
    assert(id.getAs[Boolean]("max_changed")) // 10 vs 8
    val lb = d("label")
    assert(lb.getAs[Double]("ndv_a") == 2d && lb.getAs[Double]("ndv_b") == 3d)
    assert(!lb.getAs[Boolean]("min_changed")) // both "a"
    assert(lb.getAs[Boolean]("max_changed")) // "b" vs "c"
  }
}
