package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sequence-continuity audit (Validate.sequenceGaps). */
class IntegritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("reports each hole once with its exact width") {
    import spark.implicits._
    // partition p: 1,2,5,6,9 -> holes (2,5) missing 2 and (6,9) missing 2
    // partition q: 10,11,12 -> contiguous, no findings
    val df = (Seq(1L, 2L, 5L, 6L, 9L).map(("p", _)) ++
      Seq(10L, 11L, 12L).map(("q", _))).toDF("part", "seq")
    val got = Validate.sequenceGaps(df, Seq("part"), "seq")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === Set(("p", 2L, 5L, 2L), ("p", 6L, 9L, 2L)))
  }

  test("healthy contiguous log is empty; duplicates are not gaps") {
    import spark.implicits._
    val dup = Seq(("p", 1L), ("p", 2L), ("p", 2L), ("p", 3L)).toDF("part", "seq")
    assert(Validate.sequenceGaps(dup, Seq("part"), "seq").count() === 0L)
    val empty = dup.filter($"seq" < 0L)
    assert(Validate.sequenceGaps(empty, Seq("part"), "seq").count() === 0L)
  }

  test("holes at a partition boundary are invisible (documented caveat)") {
    import spark.implicits._
    // blocks of 10; id 20 missing at the START of block 2: within-block
    // lag cannot see it — the caveat the gate's residue choice avoids
    val df = (Seq(18L, 19L) ++ Seq(21L, 22L)).map(i => (i / 10L, i))
      .toDF("block", "seq")
    assert(Validate.sequenceGaps(df, Seq("block"), "seq").count() === 0L)
  }
}
