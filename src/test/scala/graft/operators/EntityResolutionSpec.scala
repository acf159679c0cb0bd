package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def names(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, f"Widget-$i%05d")).toDF("id", "name")
  }

  test("globalRank equals the window row_number under any partition layout") {
    import spark.implicits._
    val df = names(4000)
    val ref = df.withColumn("_rank",
        row_number().over(Window.orderBy($"name", $"id")).cast("long") - 1L)
      .select($"id", $"_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(df.repartition(7), df.repartition(32, $"name")).foreach { d =>
      val got = EntityResolution.globalRank(d, "id", "name")
        .select($"id", $"_rank")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref)
    }
  }

  test("neighborhood pairs are exactly the rank-window pairs") {
    import spark.implicits._
    val df = names(500)
    val got = EntityResolution.neighborhoodPairs(df, "id", "name", w = 4)
      .select($"id_a", $"id_b", $"rank_gap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: rows sorted by (name, id); pair i with i+1..i+3
    val sorted = (0 until 500).map(i => (i.toLong, f"Widget-$i%05d"))
      .sortBy { case (id, nm) => (nm, id) }
    val ref = (for {
      i <- sorted.indices
      g <- 1 to 3 if i + g < sorted.size
    } yield (sorted(i)._1, sorted(i + g)._1, g)).toSet
    assert(got == ref)
    assert(got.size == 500 * 3 - (1 + 2 + 3))
  }

  test("fuzzyPairs links planted typos and nothing else") {
    import spark.implicits._
    val df = Seq(
      (1L, "acme corp"), (2L, "acme c0rp"), (3L, "acme corpx"),
      (4L, "zenith ltd"), (5L, "completely different")
    ).toDF("id", "name")
    val got = EntityResolution.fuzzyPairs(df, "id", "name", w = 5, maxDist = 2)
      .select($"id_a", $"id_b", $"dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // sorted: acme c0rp(2), acme corp(1), acme corpx(3), completely(5), zenith(4)
    assert(got.contains((2L, 1L, 1L)), "typo pair must link")
    assert(got.contains((1L, 3L, 1L)) && got.contains((2L, 3L, 2L)))
    assert(got.map(p => Set(p._1, p._2)).forall(s => !(s.contains(4L) || s.contains(5L))),
      "distant strings must not link")
  }

  test("no data-sized unpartitioned window in the plan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate}
    val plan = EntityResolution.fuzzyPairs(names(1000), "id", "name", 6, 2)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    windows.foreach { w =>
      if (w.partitionSpec.isEmpty) {
        val aggBelow = w.child.collectFirst { case a: Aggregate => a }
        assert(aggBelow.isDefined,
          s"unpartitioned window must sit on the per-partition counts, got:\n$w")
      }
    }
  }

  test("levenshtein matches the classic definition on known cases") {
    import spark.implicits._
    val got = Seq(("kitten", "sitting"), ("flaw", "lawn"), ("", "abc"),
        ("same", "same"))
      .toDF("a", "b")
      .select(levenshtein($"a", $"b")).as[Int].collect().toSeq
    assert(got == Seq(3, 2, 3, 0))
  }

  test("multi-pass catches the first-character typo the single pass " +
      "provably misses") {
    import spark.implicits._
    // "qidget" is one edit from "widget" but sorts far away (q vs w):
    // a forest of r*/t* names fills the w=3 neighborhood BETWEEN them.
    // Reversed, both become "tegdi?" — adjacent in the second pass
    // (reversed fillers start with digits, sorting before both).
    val rows = (Seq((1L, "widget"), (2L, "qidget")) ++
      (10L to 40L).map(i => (i, f"r_filler_$i%03d")) ++
      (50L to 80L).map(i => (i, f"t_filler_$i%03d"))).toDF("id", "name")
    val single = EntityResolution.fuzzyPairs(rows, "id", "name",
        w = 3, maxDist = 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(!single.contains((2L, 1L)) && !single.contains((1L, 2L)),
      "fixture broken: the single pass was supposed to miss the prefix typo")
    val multi = EntityResolution.fuzzyPairsMultiPass(rows, "id", "name",
        w = 3, maxDist = 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(multi.contains((1L, 2L)), s"multi-pass missed the typo: $multi")
    // normalization: every pair is id_a < id_b exactly once
    val multiRows = EntityResolution.fuzzyPairsMultiPass(rows, "id", "name",
      w = 3, maxDist = 1).collect()
    assert(multiRows.forall(r =>
      r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(multiRows.map(r => (r.getAs[Long]("id_a"),
      r.getAs[Long]("id_b"))).distinct.length == multiRows.length)
    // the single pass's own pairs all survive into the union
    assert(single.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .subsetOf(multi))
  }
}
