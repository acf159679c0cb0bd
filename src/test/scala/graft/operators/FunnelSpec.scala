package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("steps advance only on strictly-later events, in sequence order") {
    import spark.implicits._
    val events = Seq(
      // u1 completes the whole funnel in order
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "click", 30L),
      (1L, "purchase", 40L),
      // u2: a view BEFORE signup must not count; a view AT the signup ts
      // must not count (strictly after); click before the qualifying view
      // must not count → stops at step 2
      (2L, "view", 5L), (2L, "signup", 10L), (2L, "view", 10L),
      (2L, "view", 50L), (2L, "click", 40L),
      // u3 signs up only
      (3L, "signup", 10L),
      // u4 never signs up → not in the funnel at all
      (4L, "view", 10L), (4L, "click", 20L), (4L, "purchase", 30L))
      .toDF("user_id", "event_type", "ts")
    val steps = Seq("signup", "view", "click", "purchase")

    val times = Funnel.stepTimes(events, "user_id", "event_type", "ts", steps)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0),
        (1 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))
      .toMap
    assert(times(1L) == Seq(Some(10L), Some(20L), Some(30L), Some(40L)))
    assert(times(2L) == Seq(Some(10L), Some(50L), None, None))
    assert(times(3L) == Seq(Some(10L), None, None, None))
    assert(!times.contains(4L))

    val counts = Funnel.funnelCounts(events, "user_id", "event_type", "ts", steps)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
    assert(counts == List(
      (1, "signup", 3L), (2, "view", 2L), (3, "click", 1L), (4, "purchase", 1L)))
  }

  test("maxGapUs bounds each transition; the greedy anchor is pinned") {
    import spark.implicits._
    val events = Seq(
      // u1 converts inside every 15-unit window
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "click", 30L),
      // u2's view comes 16 units after signup: outside the window,
      // funnel stops at step 1 even though the view exists
      (2L, "signup", 10L), (2L, "view", 26L), (2L, "click", 27L),
      // u3: GREEDY contract — the first view (t=20, in window) anchors
      // step 2; the click at 40 is outside view@20's window and the
      // later view@30 is NOT re-explored, so u3 stops at step 2
      (3L, "signup", 10L), (3L, "view", 20L), (3L, "view", 30L),
      (3L, "click", 40L))
      .toDF("user_id", "event_type", "ts")
    val steps = Seq("signup", "view", "click")
    val times = Funnel.stepTimes(events, "user_id", "event_type", "ts",
        steps, maxGapUs = Some(15L))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0),
        (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))
      .toMap
    assert(times(1L) == Seq(Some(10L), Some(20L), Some(30L)))
    assert(times(2L) == Seq(Some(10L), None, None))
    assert(times(3L) == Seq(Some(10L), Some(20L), None))
    // unbounded run still converts u2 and u3 fully (the bound did it)
    val unbounded = Funnel.stepTimes(events, "user_id", "event_type", "ts",
        steps)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.isNullAt(3))).toMap
    assert(!unbounded(2L) && !unbounded(3L))
  }
}
