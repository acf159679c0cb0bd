package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's failure accounting: a query that throws
  * mid-measurement must surface its exception in `err` AND flag itself —
  * the round-8 artifact recorded a silent (-1, flagged=false) and could
  * still stamp `contaminated: false` while missing a number.
  */
class BenchSpec extends AnyFunSuite {

  test("a throwing query records err and is flagged (never a silent -1)") {
    val st = Bench.measureWith(
      () => throw new IllegalStateException("boom: fixture \"path\" lost"),
      nCpus = 4.0)
    assert(st.flagged, "an erred query must force the run-level flag")
    assert(st.err.isDefined)
    assert(st.err.get.startsWith("java.lang.IllegalStateException: boom"))
    assert(st.med == -1 && st.runs == 0)
  }

  test("a failure on a LATER sample (post-warmup) still lands in err") {
    var calls = 0
    val st = Bench.measureWith(() => {
      calls += 1
      if (calls >= 3) throw new RuntimeException("flaky on sample 2")
      (0.01, 0.0)
    }, nCpus = 4.0)
    assert(st.err.exists(_.contains("flaky on sample 2")))
    assert(st.flagged)
  }

  test("clean samples yield median-of-3, no err, no flag") {
    val walls = Iterator(9.9, 0.30, 0.10, 0.20) // warmup discarded
    val st = Bench.measureWith(() => (walls.next(), 0.0), nCpus = 4.0)
    assert(st.err.isEmpty && !st.flagged)
    assert(st.med == 0.20 && st.min == 0.10 && st.max == 0.30 && st.runs == 3)
  }

  test("spread-suspicious samples are re-taken and persistent spread flags") {
    // spread > 2x and > 0.3 s absolute on every round -> 2 retries, flagged
    val walls = Iterator(1.0, 2.0, 0.1, 0.15, 2.0, 2.0)
    val st = Bench.measureWith(() => (walls.next(), 0.0), nCpus = 4.0)
    assert(st.runs == 5, "two re-samples after the initial three")
    assert(st.flagged && st.err.isEmpty)
  }

  test("err strings JSON-escape quotes, backslashes and control chars") {
    assert(Bench.jsonStr("a\"b\\c\nd\tef")
      == "\"a\\\"b\\\\c\\nd\\te\\u0001f\"")
  }

  test("a null exception message stays a parseable err string") {
    val st = Bench.measureWith(
      () => throw new NullPointerException(), nCpus = 4.0)
    assert(st.err.exists(_ == "java.lang.NullPointerException: null"))
  }
}
