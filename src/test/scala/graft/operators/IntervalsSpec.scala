package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def brute(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)])
      : Set[(Long, Long)] =
    (for {
      (lid, s1, e1) <- ls
      (rid, s2, e2) <- rs
      if s1 <= e2 && s2 <= e1
    } yield (lid, rid)).toSet

  test("overlapJoin == brute-force nested loop on a random-ish fixture") {
    import spark.implicits._
    // deterministic pseudo-random intervals of mixed lengths: some far
    // shorter than the bin, some spanning dozens of bins
    val ls = (0L until 80L).map { i =>
      val s = (i * 977) % 5000
      (i, s, s + (i * 131) % 700)
    }
    val rs = (0L until 60L).map { j =>
      val s = (j * 643) % 5000
      (1000 + j, s, s + (j * 37) % 2500)
    }
    val left = ls.toDF("lid", "ls", "le").repartition(5)
    val right = rs.toDF("rid", "rs", "re").repartition(3)
    for (bin <- Seq(1L, 7L, 100L, 10000L)) {
      val got = Intervals.overlapJoin(left, right, "ls", "le", "rs", "re",
          binUs = bin)
        .select($"lid", $"rid").as[(Long, Long)].collect()
      // exactness AND no duplicate emission, at every bin granularity
      assert(got.length === got.toSet.size, s"duplicate pairs at bin=$bin")
      assert(got.toSet === brute(ls, rs), s"wrong pair set at bin=$bin")
    }
  }

  test("point intervals overlap exactly the intervals covering them") {
    import spark.implicits._
    val left = Seq((1L, 10L, 10L)).toDF("lid", "ls", "le") // point at 10
    val right = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 11L, 12L))
      .toDF("rid", "rs", "re")
    val got = Intervals.overlapJoin(left, right, "ls", "le", "rs", "re", 4L)
      .select($"rid").as[Long].collect().toSet
    assert(got === Set(1L, 2L)) // closed-interval semantics
  }

  test("NULL bounds drop; inverted intervals match nothing") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(0L), Some(100L)),
      (2L, None, Some(100L)),    // NULL start: dropped
      (3L, Some(50L), Some(10L)) // inverted: empty
    ).toDF("lid", "ls", "le")
    val right = Seq((9L, 0L, 1000L)).toDF("rid", "rs", "re")
    val got = Intervals.overlapJoin(left, right, "ls", "le", "rs", "re", 10L)
      .select($"lid").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("extra equi-keys restrict pairs to the same key") {
    import spark.implicits._
    val left = Seq(("a", 1L, 0L, 100L), ("b", 2L, 0L, 100L))
      .toDF("tenant", "lid", "ls", "le")
    val right = Seq(("a", 9L, 50L, 60L)).toDF("tenant", "rid", "rs", "re")
    val got = Intervals.overlapJoin(left, right, "ls", "le", "rs", "re",
        10L, keys = Seq("tenant"))
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 9L)))
  }

  test("the plan is an equi join on the bin, never a nested loop") {
    import spark.implicits._
    // parquet-backed so nothing folds into a LocalRelation
    val tmp = java.nio.file.Files.createTempDirectory("intervals").toString
    (0L until 500L).map(i => (i, i * 13 % 3000, i * 13 % 3000 + 40))
      .toDF("lid", "ls", "le").write.parquet(s"$tmp/l")
    (0L until 300L).map(j => (j, j * 29 % 3000, j * 29 % 3000 + 90))
      .toDF("rid", "rs", "re").write.parquet(s"$tmp/r")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val joined = Intervals.overlapJoin(
        spark.read.parquet(s"$tmp/l"), spark.read.parquet(s"$tmp/r"),
        "ls", "le", "rs", "re", binUs = 100L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"the overlap join must not plan a comparison matrix:\n$plan")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
        s"expected an equi shuffle join on the bin:\n$plan")
    } finally {
      spark.conf.set(key, old)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}
