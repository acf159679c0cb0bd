package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scalar reference: brute-force triangle enumeration. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }.toSeq.distinct
    val counts = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.sorted.combinations(3)
      if e((a, b)) && e((a, c)) && e((b, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Triangles.triangleCounts(edges.toDF("item_a", "item_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches brute force on a clique + pendant + square") {
    // K4 on 1..4 (4 triangles, 3 per node), pendant 5, square 6-7-8-9 (none)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L), (7L, 8L), (8L, 9L), (9L, 6L))
    val got = run(edges)
    assert(got == reference(edges))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("matches brute force on a random graph, duplicate/reversed/self edges ignored") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val noisy = base ++ base.map(_.swap) ++ Seq((3L, 3L), (5L, 5L))
    assert(run(noisy) == reference(base))
  }

  test("hub star closes no triangles; one cross edge closes exactly its wedge") {
    // star center 0 with leaves 1..50: no triangles; add (1,2): one triangle
    val star = (1L to 50L).map(i => (0L, i))
    assert(run(star).isEmpty)
    val got = run(star :+ (1L, 2L))
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("co-occurrence projection counts shared baskets with the hub cap") {
    import spark.implicits._
    val inc = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),      // basket 10: {1,2,3}
      (11L, 1L), (11L, 2L),                 // basket 11: {1,2}
      (12L, 2L), (12L, 3L),                 // basket 12: {2,3}
      (12L, 2L)                             // duplicate incidence ignored
    ) ++ (1L to 40L).map(i => (99L, 100L + i)) // hub basket above the cap
    val got = CoOccurrence.project(inc.toDF("b", "i"), "b", "i",
        minShared = 2L, maxBasketSize = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 2L), (2L, 3L, 2L)))
  }
}
