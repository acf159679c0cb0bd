package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.Subject.{matches, subject_matches}

/** Property test: for RANDOM subjects and patterns the compiled native
  * predicates (equality / startsWith / rlike) agree with the scalar matcher
  * — the guarantee that the codegen fast path cannot silently diverge from
  * the NATS semantics. Fixed seed → deterministic regression test.
  */
class SubjectPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Includes the empty token so trailing/leading/double dots are generated —
  // degenerate per NATS, but the compiled predicates must still agree with
  // the scalar matcher on them (ADVICE round 2).
  private val token: Gen[String] = Gen.frequency(
    (10, Gen.oneOf("HCM", "CDC", "HR", "hrdb", "employees", "events", "a", "b", "x1", "y22")),
    (1, Gen.const("")))
  private val subjectGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, token)).map(_.mkString("."))
  private val patternTok: Gen[String] = Gen.frequency(
    (5, token), (2, Gen.const("*")), (1, Gen.const(">")))
  private val patternGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, patternTok)).map(_.mkString("."))

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  test("compiled predicate == scalar matcher on 30 random subject/pattern batches") {
    import spark.implicits._
    (1 to 30).foreach { round =>
      val subjects = sample(Gen.listOfN(20, subjectGen), round * 7919L).distinct
      val patterns = sample(Gen.listOfN(6, patternGen), round * 104729L).distinct
      val df = subjects.toDF("subject")
      patterns.foreach { p =>
        val got = df.filter(subject_matches($"subject", lit(p)))
          .as[String].collect().sorted.toSeq
        val want = subjects.filter(matches(_, p)).sorted
        assert(got == want, s"round=$round pattern=$p subjects=$subjects")
      }
    }
  }

  test("compiled predicate == scalar matcher on trailing-dot edge cases") {
    import spark.implicits._
    val subjects = Seq("A", "A.", "A..", ".A", "HCM", "HCM.", "HCM.x", "HCM..", "", ".")
    val patterns = Seq("A", "A.", "HCM.>", "HCM.*", ">", "*", ".>", "A..", "*.")
    val df = subjects.toDF("subject")
    patterns.foreach { p =>
      val got = df.filter(subject_matches($"subject", lit(p)))
        .as[String].collect().sorted.toSeq
      val want = subjects.filter(matches(_, p)).sorted
      assert(got == want, s"pattern=$p got=$got want=$want")
    }
  }
}
