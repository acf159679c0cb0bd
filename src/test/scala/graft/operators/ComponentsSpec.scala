package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two clusters and a chain collapse to min-id components") {
    // {1,2,3} via transitive pairs, {10,11}, chain {20..24}
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L))
  }

  test("random graphs match a union-find model") {
    val rnd = new scala.util.Random(13)
    for (round <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> {
          // canonical = min id in the component
          val root = find(id.toInt)
          edges.flatMap(e => Seq(e._1, e._2)).distinct
            .filter(j => find(j.toInt) == root).min
        }).toMap
      assert(cc(edges) == want, s"round $round")
    }
  }
}
