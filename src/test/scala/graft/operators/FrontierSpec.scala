package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class FrontierSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("canonical dedup: tracker/fragment variants collapse, max " +
      "priority wins, n_discovered counts every sighting") {
    import spark.implicits._
    val urls = Seq(
      ("https://a.io/page", 5.0),
      ("https://A.IO:443/page?utm_source=x#frag", 9.0),
      ("https://a.io/x/../page", 1.0),
      ("https://b.io/only", 3.0)).toDF("url", "p")
    val got = Frontier.schedule(urls, "url", "p")
      .orderBy($"host", $"slot").collect()
    assert(got.length === 2)
    val a = got.find(_.getString(0) == "a.io").get
    assert(a.getString(1) === "https://a.io/page")
    assert(a.getDouble(2) === 9.0)
    assert(a.getLong(5) === 3L) // three sightings, one fetch
  }

  test("politeness invariant: per host at most ONE url per slot, slots " +
      "dense from 0, fetch_at_sec = slot * delay; layout-invariant") {
    import spark.implicits._
    val urls = (0 until 60).map { i =>
      (s"https://h${i % 4}.io/p$i", (i * 37 % 11).toDouble)
    }
    for (parts <- Seq(1, 7)) {
      val got = Frontier.schedule(
          urls.toDF("url", "p").repartition(parts), "url", "p",
          crawlDelaySec = 2.0)
        .collect()
        .map(r => (r.getString(0), r.getLong(3), r.getDouble(4),
          r.getString(1)))
      val byHost = got.groupBy(_._1)
      byHost.foreach { case (h, rows) =>
        val slots = rows.map(_._2).sorted
        assert(slots === (0L until rows.length.toLong).toArray,
          s"host $h slots not dense")
        rows.foreach { case (_, s, t, _) => assert(t === s * 2.0) }
      }
      // determinism across layouts: pin the exact (host, slot) -> url map
      val m = got.map(r => (r._1, r._2) -> r._4).toMap
      val single = Frontier.schedule(urls.toDF("url", "p"), "url", "p",
          crawlDelaySec = 2.0).collect()
        .map(r => (r.getString(0), r.getLong(3)) -> r.getString(1)).toMap
      assert(m === single, s"parts=$parts")
    }
  }

  test("maxPerHost truncates the LOW-priority tail; priority ties break " +
      "on url ascending") {
    import spark.implicits._
    val urls = (0 until 10).map(i => (f"https://h.io/p$i%02d", i.toDouble))
    val got = Frontier.schedule(urls.toDF("url", "p"), "url", "p",
        maxPerHost = 3)
      .orderBy($"slot").collect()
    assert(got.map(_.getString(1)).toSeq ===
      Seq("https://h.io/p09", "https://h.io/p08", "https://h.io/p07"))
    val tied = Seq(("https://h.io/b", 1.0), ("https://h.io/a", 1.0))
    val t = Frontier.schedule(tied.toDF("url", "p"), "url", "p")
      .orderBy($"slot").collect()
    assert(t.map(_.getString(1)).toSeq ===
      Seq("https://h.io/a", "https://h.io/b"))
  }

  test("hostOf: userinfo and port strip, case lowers, non-URLs drop " +
      "out of the schedule") {
    import spark.implicits._
    val urls = Seq(
      ("https://u:p@Host.IO:8443/x", 1.0),
      ("not-a-url", 2.0)).toDF("url", "p")
    val got = Frontier.schedule(urls, "url", "p").collect()
    assert(got.length === 1)
    assert(got(0).getString(0) === "host.io")
  }
}
