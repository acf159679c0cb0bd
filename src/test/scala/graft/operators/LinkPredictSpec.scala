package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LinkPredictSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sym(e: Seq[(Long, Long)]) = e ++ e.map(_.swap)

  test("neighborScores matches a hand-computed scalar model on a " +
      "4-cycle with a chord") {
    import spark.implicits._
    // square 1-2-3-4 plus chord 1-3: degrees 1:3, 2:2, 3:3, 4:2
    val g = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    val got = LinkPredict.neighborScores(g.toDF("s", "d"), "s", "d")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // pair (2,4): middles {1, 3} both deg 3 -> cn=2, jc=2/(2+2-2)=1,
    // aa = 2/ln3, ra = 2/3
    assert(got((2L, 4L)) ===
      ((2L, 1.0, r6(2.0 / math.log(3.0)), r6(2.0 / 3.0))))
    // pair (1,3): middles {2, 4} both deg 2 -> cn=2, jc=2/(3+3-2)=0.5
    assert(got((1L, 3L)) ===
      ((2L, 0.5, r6(2.0 / math.log(2.0)), r6(2.0 / 2.0))))
    // pairs (1,2),(2,3),(3,4),(1,4): one middle of deg 3 each
    assert(got((1L, 2L)) ===
      ((1L, r6(1.0 / (3 + 2 - 1)), r6(1.0 / math.log(3.0)), r6(1.0 / 3.0))))
    assert(got.size === 6)
  }

  test("neighborScores: the middle-degree cap excludes hub middles from " +
      "cn/aa/ra while jc keeps uncapped endpoint degrees") {
    import spark.implicits._
    // hub 100 adjacent to 1..10; plus a deg-2 middle 50 linking 1 and 2
    val g = sym((1L to 10L).map(i => (100L, i)) ++ Seq((50L, 1L), (50L, 2L)))
    val capped = LinkPredict.neighborScores(g.toDF("s", "d"), "s", "d",
        maxMiddleDegree = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3))))
      .toMap
    // hub (deg 10) > cap: its 45 spoke pairs vanish; (1,2) survives via
    // middle 50 (deg 2) and (50,100) via middles 1 and 2 — endpoint
    // degrees stay UNCAPPED (jc of (50,100) sees the hub's full deg 10)
    assert(capped.keySet === Set((1L, 2L), (50L, 100L)))
    assert(capped((1L, 2L)) ===
      ((1L, math.round(1.0 / (2 + 2 - 1) * 1e6) / 1e6)))
    assert(capped((50L, 100L)) === ((2L, 2.0 / (2 + 10 - 2))))
    // without the cap the hub connects all 45 spoke pairs too
    val full = LinkPredict.neighborScores(g.toDF("s", "d"), "s", "d")
      .count()
    assert(full === 46L)
  }

  test("neighborScores is layout-invariant and a degree-1 middle never " +
      "divides by ln(1)") {
    import spark.implicits._
    val rnd = (0 until 400).map(i =>
      ((i * 13L) % 40, (i * 29L + 5) % 40)).filter(p => p._1 != p._2)
    val g = sym(rnd)
    val runs = Seq(1, 7).map { parts =>
      LinkPredict.neighborScores(g.toDF("s", "d").repartition(parts),
          "s", "d")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .toMap
    }
    assert(runs(0) === runs(1))
    assert(runs(0).nonEmpty)
    assert(runs(0).values.forall { case (_, jc, aa, ra) =>
      !jc.isNaN && !aa.isNaN && !aa.isInfinite && !ra.isNaN })
    // a pendant (deg-1) middle contributes to NO pair; a lone edge
    // produces an empty frame rather than a 1/ln(1) explosion
    val lone = LinkPredict.neighborScores(
      sym(Seq((1L, 2L))).toDF("s", "d"), "s", "d")
    assert(lone.count() === 0L)
  }

  test("an output filter on the pair endpoints pushes BELOW the " +
      "distance-2 join into both legs (the q43 plan contract)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = (0 until 400).map(i =>
      ((i * 13L) % 40, (i * 29L + 5) % 40)).filter(p => p._1 != p._2)
    val g = sym(rnd)
    val plan = LinkPredict.neighborScores(g.toDF("s", "d"), "s", "d")
      .filter(col("a") % 7 === 0 && col("b") % 7 === 0)
      .queryExecution.executedPlan.toString
    // the mod filter must reach the two mids legs AND the two endpoint
    // degree lookups — 4 pushed occurrences, none left above the
    // aggregate (Catalyst pushes group-key filters through)
    val pushed = "% 7\\) = 0".r.findAllIn(plan).size
    assert(pushed >= 4, s"expected the mod filter pushed into >= 4 legs:\n$plan")
  }

  test("degreeAssortativity: exact moments match a scalar Pearson; a " +
      "zero-variance graph returns NULL") {
    import spark.implicits._
    // star: center 0 linked to 1..5 — maximally disassortative
    val star = sym((1L to 5L).map(i => (0L, i)))
    val got = LinkPredict.degreeAssortativity(star.toDF("s", "d"), "s", "d")
      .collect()(0)
    assert(got.getLong(0) === 10L)
    // scalar Pearson over the 10 directed edges of (deg src, deg dst)
    val deg = Map(0L -> 5L) ++ (1L to 5L).map(_ -> 1L).toMap
    val xy = star.map { case (a, b) => (deg(a).toDouble, deg(b).toDouble) }
    val m = xy.size.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val num = m * xy.map(p => p._1 * p._2).sum - sx * sy
    val vx = m * xy.map(p => p._1 * p._1).sum - sx * sx
    val vy = m * xy.map(p => p._2 * p._2).sum - sy * sy
    assert(got.getDouble(1) ===
      math.round(num / math.sqrt(vx * vy) * 1e6) / 1e6)
    // a cycle is degree-regular: zero variance -> NULL, not 0/0
    val cyc = sym(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val r = LinkPredict.degreeAssortativity(cyc.toDF("s", "d"), "s", "d")
      .collect()(0)
    assert(r.isNullAt(1))
  }
}
