package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RankEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def r6(x: Double) = math.round(x * 1e6) / 1e6
  private def lg2(x: Double) = StrictMath.log(x) / StrictMath.log(2.0)

  test("hand-computed nDCG/RR/precision/recall at k=3; duplicate " +
      "judgments collapse to max gain; unjudged ranked items gain 0") {
    import spark.implicits._
    val ranked = Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 3L, 3L),
      ("A", 4L, 4L), ("A", 5L, 5L), ("B", 7L, 1L), ("B", 8L, 2L))
      .toDF("qid", "doc_id", "rnk")
    val rel = Seq(("A", 2L, 2.0), ("A", 2L, 1.0), // dup -> max gain 2
      ("A", 5L, 1.0), ("A", 9L, 1.0), ("C", 4L, 1.0))
      .toDF("qid", "doc_id", "gain")
    val got = RankEval.rankEval(ranked, rel, "qid", "doc_id", "rnk",
        "gain", k = 3)
      .orderBy($"qid").collect()
      .map(r => r.getString(0) -> r).toMap
    // qid A: top-3 = {1,2,3}, only id 2 judged (gain 2 after dedupe)
    val a = got("A")
    assert(a.getLong(1) === 3L && a.getLong(2) === 3L && a.getLong(3) === 1L)
    assert(a.getDouble(4) === r6(1.0 / 3))                 // precision
    assert(a.getDouble(5) === r6(1.0 / 3))                 // recall (3 judged)
    assert(a.getDouble(6) === 0.5)                         // rr: first hit at 2
    val dcg = 2.0 / lg2(3.0)
    val idcg = 2.0 / lg2(2.0) + 1.0 / lg2(3.0) + 1.0 / lg2(4.0)
    assert(a.getDouble(7) === r6(dcg / idcg))              // ndcg
    assert(a.getDouble(8) === r6((1.0 / 2) / 3))           // ap: P@2 over 3
    // qid B: nothing judged -> NULL recall/ndcg/ap, rr 0
    val b = got("B")
    assert(b.getLong(2) === 0L && b.getDouble(4) === 0.0 &&
      b.isNullAt(5) && b.getDouble(6) === 0.0 && b.isNullAt(7) &&
      b.isNullAt(8))
    // qid C: judged but never ranked -> zeros, recall 0, ndcg 0, ap 0
    val c = got("C")
    assert(c.getLong(1) === 0L && c.getLong(2) === 1L &&
      c.getDouble(5) === 0.0 && c.getDouble(6) === 0.0 &&
      c.getDouble(7) === 0.0 && c.getDouble(8) === 0.0)
  }

  test("perfect ranking scores ndcg = rr = 1; k truncates both the list " +
      "and the ideal; non-positive gains are not judgments") {
    import spark.implicits._
    val ranked = (1L to 10L).map(i => ("q", i, i)).toDF("qid", "doc_id", "rnk")
    val rel = Seq(("q", 1L, 3.0), ("q", 2L, 2.0), ("q", 3L, 1.0),
      ("q", 4L, 0.0), ("q", 5L, -1.0)) // zero/negative gain = unjudged
      .toDF("qid", "doc_id", "gain")
    val got = RankEval.rankEval(ranked, rel, "qid", "doc_id", "rnk",
      "gain", k = 3).collect()(0)
    assert(got.getLong(2) === 3L && got.getLong(3) === 3L)
    assert(got.getDouble(6) === 1.0 && got.getDouble(7) === 1.0)
    assert(got.getDouble(4) === 1.0 && got.getDouble(5) === 1.0)
    assert(got.getDouble(8) === 1.0) // ap: perfect ranking
  }

  test("layout invariance of the PRE-round doubles: DCG/AP/IDCG fold in " +
      "fixed rank order, bit-equal to the scalar sequential fold at any " +
      "partitioning") {
    import spark.implicits._
    val k = 20
    // 30 queries x 20 ranked rows; gains are 'awkward' doubles (j/7.0)
    // so any association change in a 20-term sum moves the last ulps
    val ranked = (for (q <- 1 to 30; r <- 1 to k)
      yield (s"q$q", (q * 1000 + r).toLong, r.toLong))
      .toDF("qid", "doc_id", "rnk")
    val rel = (for (q <- 1 to 30; r <- 1 to k; if (q + r) % 3 != 0)
      yield (s"q$q", (q * 1000 + r).toLong, (r % 7 + 1).toDouble / 7.0))
      .toDF("qid", "doc_id", "gain")
    // scalar model: strict sequential left fold in rank order
    def expected(q: Int): (Double, Double, Double) = {
      val rows = (1 to k).map { r =>
        val judged = (q + r) % 3 != 0
        (r, if (judged) Some((r % 7 + 1).toDouble / 7.0) else None)
      }
      val dcg = rows.foldLeft(0.0) { case (acc, (r, g)) =>
        acc + g.getOrElse(0.0) / lg2(r.toDouble + 1.0) }
      var hits = 0
      val ap = rows.foldLeft(0.0) { case (acc, (r, g)) =>
        if (g.isDefined) { hits += 1; acc + hits.toDouble / r } else acc }
      val ideal = rows.collect { case (r, Some(g)) => (g, r) }
        .sortBy { case (g, r) => (-g, q * 1000 + r) } // gain DESC, id ASC
        .take(k).zipWithIndex
      val idcg = ideal.foldLeft(0.0) { case (acc, ((g, _), i)) =>
        acc + g / lg2(i + 2.0) }
      (dcg, ap, idcg)
    }
    for (parts <- Seq(1, 13)) {
      val got = RankEval.rankEval(ranked.repartition(parts),
          rel.repartition(parts), "qid", "doc_id", "rnk", "gain", k)
        .collect().map(r => r.getString(0) -> r).toMap
      for (q <- 1 to 30) {
        val (dcg, ap, idcg) = expected(q)
        val nRel = (1 to k).count(r => (q + r) % 3 != 0)
        val row = got(s"q$q")
        assert(row.getDouble(7) === r6(dcg / idcg),
          s"parts=$parts q=$q: ndcg fold must equal the scalar left fold")
        assert(row.getDouble(8) === r6(ap / math.min(nRel, k)),
          s"parts=$parts q=$q: ap fold must equal the scalar left fold")
      }
    }
  }
}
