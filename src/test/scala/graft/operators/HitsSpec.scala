package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scalar model of the EXACT fixed-point iteration: raw integer sums,
    * normalization by q = max(S div scale, 1) — mirrors Hits.hits
    * arithmetic operation for operation.
    */
  private def scalarHits(edges: Seq[(Long, Long)], iters: Int,
                         scale: Long): Map[Long, (Long, Long)] = {
    val e = edges.distinct
    var h: Map[Long, Long] = e.map(_._1).distinct.map(_ -> scale).toMap
    var a: Map[Long, Long] = Map.empty
    for (_ <- 1 to iters) {
      val araw = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => h(x._1)).sum
      }
      val qa = math.max(araw.values.sum / scale, 1L)
      a = araw.map { case (k, v) => k -> v / qa }
      val hraw = e.groupBy(_._1).map { case (s, es) =>
        s -> es.map(x => a(x._2)).sum
      }
      val qh = math.max(hraw.values.sum / scale, 1L)
      h = hraw.map { case (k, v) => k -> v / qh }
    }
    (h.keySet ++ a.keySet).map(n =>
      n -> (h.getOrElse(n, 0L), a.getOrElse(n, 0L))).toMap
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Hits.hits(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("hits matches the scalar fixed-point model on a pseudo-random " +
      "digraph, at 1 and at 3 iterations, and is layout-invariant") {
    import spark.implicits._
    val edges = (0 until 400).map(i =>
      ((i * 13L) % 40, 100L + (i * 29L + 5) % 50)).distinct
    for (iters <- Seq(1, 3)) {
      val want = scalarHits(edges, iters, 1000000000L)
      assert(run(edges, iters) === want, s"iters=$iters")
    }
    val want3 = scalarHits(edges, 3, 1000000000L)
    val repart = Hits.hits(edges.toDF("s", "d").repartition(17), "s", "d")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(repart === want3, "a different partition layout changed a score")
  }

  test("authorities rank by curation quality, not raw degree alone; " +
      "hubs and authorities separate on a bipartite graph; a chain node " +
      "holds both roles") {
    // parts: 201 bought by customers {1,2,3}, 202 by {1}, 203 by {2,3}
    val g = Seq((1L, 201L), (2L, 201L), (3L, 201L), (1L, 202L),
      (2L, 203L), (3L, 203L))
    val got = run(g)
    // bipartite: customers have auth 0, parts have hub 0
    assert(Seq(1L, 2L, 3L).forall(got(_)._2 === 0L))
    assert(Seq(201L, 202L, 203L).forall(got(_)._1 === 0L))
    // in-degree order 201 (3) > 203 (2) > 202 (1) holds here
    assert(got(201L)._2 > got(203L)._2 && got(203L)._2 > got(202L)._2)
    // scalar agreement on the same fixture
    assert(got === scalarHits(g, 3, 1000000000L))
    // 1 -> 2 -> 3: node 2 is both a hub (points at 3) and an authority
    val chain = run(Seq((1L, 2L), (2L, 3L)))
    assert(chain(2L)._1 > 0L && chain(2L)._2 > 0L)
    assert(chain(1L)._2 === 0L && chain(3L)._1 === 0L)
  }

  test("an empty edge list and bad parameters fail loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("s", "d")
    assertThrows[IllegalArgumentException] {
      Hits.hits(empty, "s", "d")
    }
    assertThrows[IllegalArgumentException] {
      Hits.hits(Seq((1L, 2L)).toDF("s", "d"), "s", "d", iterations = 0)
    }
  }
}
