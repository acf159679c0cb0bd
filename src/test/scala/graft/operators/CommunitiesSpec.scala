package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CommunitiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scalar reference: synchronous LPA, most-frequent in-neighbor label,
    * ties to the smallest, keep when no in-edges.
    */
  private def ref(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var labels = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      val next = nodes.map { n =>
        val votes = edges.filter(_._2 == n).map(e => labels(e._1))
        if (votes.isEmpty) n -> labels(n)
        else {
          val counts = votes.groupBy(identity).view.mapValues(_.size)
          n -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
        }
      }.toMap
      labels = next
    }
    labels
  }

  private def sym(undirected: Seq[(Long, Long)]): Seq[(Long, Long)] =
    undirected ++ undirected.map(_.swap)

  private def run(edges: Seq[(Long, Long)], rounds: Int,
                  parts: Int = 5): Map[Long, Long] = {
    import spark.implicits._
    Communities.labelPropagation(
        edges.toDF("src", "dst").repartition(parts), "src", "dst", rounds)
      .as[(Long, Long)].collect().toMap
  }

  test("two dense cliques + one bridge resolve to two communities") {
    // cliques {1,2,3} and {10,11,12}, bridged 3-10
    val e = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)))
    val got = run(e, rounds = 3)
    assert(got === ref(e, rounds = 3))
    // both cliques collapse onto their smallest member's label
    assert(Set(got(1L), got(2L)).size === 1)
    assert(Set(got(10L), got(11L), got(12L)).size === 1)
  }

  test("matches the scalar reference on a pseudo-random graph, any layout") {
    val e = sym((0 until 60).map(i =>
      ((i * 17L) % 20, (i * 31L + 7) % 20)).filter(p => p._1 != p._2))
    for (rounds <- Seq(1, 2, 3); parts <- Seq(1, 7)) {
      assert(run(e, rounds, parts) === ref(e, rounds),
        s"mismatch at rounds=$rounds parts=$parts")
    }
  }

  test("ties break toward the smallest label") {
    import spark.implicits._
    // node 5 hears one vote each from 1 and 2: must take 1
    val e = Seq((1L, 5L), (2L, 5L))
    val got = run(e, rounds = 1)
    assert(got(5L) === 1L)
  }

  test("a node with no in-edges keeps its label") {
    // 7 only votes, never receives
    val e = Seq((7L, 1L), (1L, 2L), (2L, 1L))
    val got = run(e, rounds = 2)
    assert(got(7L) === 7L)
    assert(got === ref(e, 2))
  }

  test("rounds must be >= 1") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Communities.labelPropagation(df, "src", "dst", 0)
    }
  }

  /** Scalar reference for the warm start: prior labels where known,
    * identity where not.
    */
  private def refResume(edges: Seq[(Long, Long)], prior: Map[Long, Long],
                        rounds: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var labels = nodes.map(n => n -> prior.getOrElse(n, n)).toMap
    for (_ <- 1 to rounds) {
      labels = nodes.map { n =>
        val votes = edges.filter(_._2 == n).map(e => labels(e._1))
        if (votes.isEmpty) n -> labels(n)
        else n -> votes.groupBy(identity).view.mapValues(_.size)
          .toSeq.maxBy { case (l, c) => (c, -l) }._1
      }.toMap
    }
    labels
  }

  test("persist-and-resume telescopes: resume(lpa(G,r1), G, r2) == " +
      "lpa(G, r1+r2); warm start on a delta'd graph matches the scalar " +
      "reference") {
    import spark.implicits._
    val e = sym((0 until 60).map(i =>
      ((i * 17L) % 20, (i * 31L + 7) % 20)).filter(p => p._1 != p._2))
    val prior = Communities.labelPropagation(
      e.toDF("src", "dst"), "src", "dst", rounds = 2)
    val resumed = Communities.labelPropagationResume(
        e.toDF("src", "dst"), "src", "dst", prior, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(resumed === ref(e, 3), "resume on an unchanged graph must " +
      "equal the one-shot run")
    // delta: a new clique {30,31,32} bridged into the old graph at 0
    val delta = sym(Seq((30L, 31L), (30L, 32L), (31L, 32L), (0L, 30L)))
    val union = e ++ delta
    val priorMap = prior.as[(Long, Long)].collect().toMap
    val got = Communities.labelPropagationResume(
        union.toDF("src", "dst"), "src", "dst", prior, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === refResume(union, priorMap, 2))
  }
}
