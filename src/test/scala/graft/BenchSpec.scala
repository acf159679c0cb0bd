package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's failure accounting and the round-14
  * adaptive-run policy.
  *
  * Failure accounting: a query that throws mid-measurement must surface
  * its exception in `err` AND flag itself — the round-8 artifact recorded
  * a silent (-1, flagged=false) and could still stamp
  * `contaminated: false` while missing a number.
  *
  * Adaptive runs (round-13 lesson — the fixed warmup+3 protocol cost
  * ~4x med-sum of wall and the 193-query driver bench timed out at
  * rc 124 / parsed:null): the FIRST (cold) execution is a probe; >5 s
  * queries report the probe itself (runs=1), 1–5 s queries take one warm
  * sample (runs=1), sub-second queries take two warm samples and report
  * the min (steal/GC only ever inflate wall-clock).
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

  test("a failure on a LATER sample (post-probe) still lands in err") {
    var calls = 0
    val st = Bench.measureWith(() => {
      calls += 1
      if (calls >= 3) throw new RuntimeException("flaky on sample 2")
      (0.01, 0.0)
    }, nCpus = 4.0)
    assert(st.err.exists(_.contains("flaky on sample 2")))
    assert(st.flagged)
  }

  test("a huge query (probe > 12 s) reports the probe itself, runs=1") {
    var calls = 0
    val st = Bench.measureWith(() => { calls += 1; (19.9, 0.0) }, nCpus = 4.0)
    assert(calls == 1, "a >12 s query must execute exactly once")
    assert(st.runs == 1 && st.med == 19.9 && st.min == 19.9 && st.max == 19.9)
    assert(!st.flagged && st.err.isEmpty)
  }

  test("a huge query whose probe was steal-hit gets ONE retry, min wins") {
    val walls = Iterator((19.9, 8.0), (18.5, 0.0)) // probe stolen, retry clean
    val st = Bench.measureWith(() => walls.next(), nCpus = 4.0)
    assert(st.runs == 2 && st.med == 18.5 && st.max == 19.9)
    assert(!st.flagged, "a clean retry clears the steal suspicion")
  }

  test("a slow query (5-12 s probe) takes one warm sample; min wins — a " +
      "cold catalog-init probe must not fabricate a regression") {
    val walls = Iterator((10.7, 0.0), (2.7, 0.0)) // cold init, warm truth
    val st = Bench.measureWith(() => walls.next(), nCpus = 4.0)
    assert(st.runs == 2 && st.med == 2.7 && st.min == 2.7 && st.max == 10.7)
    assert(!st.flagged && st.err.isEmpty)
  }

  test("a mid query (1-5 s) discards the probe and takes one warm sample") {
    val walls = Iterator((3.0, 0.0), (2.5, 0.0))
    val st = Bench.measureWith(() => walls.next(), nCpus = 4.0)
    assert(st.runs == 1 && st.med == 2.5 && !st.flagged && st.err.isEmpty)
  }

  test("a fast query takes two warm samples; med is the MIN of the two") {
    val walls = Iterator((0.9, 0.0), (0.30, 0.0), (0.20, 0.0))
    val st = Bench.measureWith(() => walls.next(), nCpus = 4.0)
    assert(st.err.isEmpty && !st.flagged)
    assert(st.med == 0.20 && st.min == 0.20 && st.max == 0.30 && st.runs == 2)
  }

  test("spread-suspicious fast samples get one re-sample; persistent spread flags") {
    // warm samples 2.0 vs 0.1 (spread > 2x, > 0.3 s abs) -> retry 2.0:
    // worst dropped, still {0.1, 2.0} spready -> flagged
    val walls = Iterator((0.5, 0.0), (2.0, 0.0), (0.1, 0.0), (2.0, 0.0))
    val st = Bench.measureWith(() => walls.next(), nCpus = 4.0)
    assert(st.runs == 3, "one re-sample after the initial two")
    assert(st.flagged && st.err.isEmpty)
    assert(st.med == 0.1, "med stays the min — steal only inflates")
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
