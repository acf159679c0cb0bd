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
}
