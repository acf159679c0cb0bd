package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Degenerate-input hardening across the text/curation operators: NULL
  * text, empty strings, single-word docs and empty frames must flow
  * through without exceptions and with defensible semantics (a NULL
  * document has no shingles/chunks/grams; it is not the operator's job to
  * crash the pipeline on it). The stratifiedSample NULL-stratum bug this
  * round showed how silently these paths can rot — this spec pins them.
  */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def messy = {
    import spark.implicits._
    Seq(
      (1L, Option("normal document with several plain words inside it")),
      (2L, Option("")),             // empty text
      (3L, Option.empty[String]),   // NULL text
      (4L, Option("single")),
      (5L, Option("  ")))           // whitespace only
      .toDF("doc_id", "text")
  }

  test("dedup sketches skip NULL/empty docs instead of crashing") {
    val pairs = TextDedup.nearDuplicates(messy, "doc_id", "text", threshold = 0.5)
    assert(pairs.count() == 0)
    val jac = TextDedup.jaccardNearDuplicates(messy, "doc_id", "text", threshold = 0.5)
    assert(jac.count() == 0)
    val sim = TextDedup.simhashNearDuplicates(messy, "doc_id", "text", threshold = 0.5)
    assert(sim.count() == 0)
  }

  test("text analysis scores NULL/empty docs as null-or-zero rows, all docs present") {
    import spark.implicits._
    val q = messy.select($"doc_id",
      TextAnalysis.qualityScore($"text").as("q"),
      TextAnalysis.langId($"text").as("lang"))
    assert(q.count() == 5) // no row vanishes
    val ppl = LangModel.bigramPerplexity(messy, "doc_id", "text")
    assert(ppl.count() == 5)
    assert(ppl.filter($"doc_id" === 3L).collect()(0).getLong(1) == 0L)
  }

  test("chunking, repetition and TF-IDF tolerate NULL/empty docs") {
    import spark.implicits._
    val chunks = Curation.chunkDocs(messy, "doc_id", "text", 5, 3)
    // NULL and empty texts yield no chunks; others chunk normally
    assert(chunks.filter($"doc_id".isin(2L, 3L)).count() == 0)
    assert(chunks.filter($"doc_id" === 1L).count() > 0)
    val rep = Curation.repetitionStats(messy, "doc_id", "text")
    assert(rep.count() == 5)
    val tfidf = TextAnalysis.tfidfTopK(messy, "doc_id", "text", k = 2)
    // terms only from non-null docs; no exception
    assert(tfidf.filter($"doc_id" === 3L).count() == 0)
  }

  test("evt_anomaly_daily guards degenerate strata (single day / zero variance) to NULL z") {
    import spark.implicits._
    // Spark non-ANSI division yields NULL on a zero divisor while DuckDB's
    // IEEE float ops yield inf/NaN — the explicit guard keeps both engines
    // on the same (NULL) answer for strata where z is undefined.
    val tmp = java.nio.file.Files.createTempDirectory("graft_anom").toString
    try {
      Seq(
        // 'solo': one day only (nd = 1 — the nd-1 divisor is zero)
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "solo", 1.0, "{}"),
        // 'flat': two days, identical counts (variance = 0)
        (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "flat", 1.0, "{}"),
        (3L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 1L, "flat", 1.0, "{}"),
        // 'vary': two days, different counts (z is defined)
        (4L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "vary", 1.0, "{}"),
        (5L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 1L, "vary", 1.0, "{}"),
        (6L, java.sql.Timestamp.valueOf("2024-01-02 11:00:00"), 1L, "vary", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$tmp/events.parquet")
      val z = graft.queries.Events.queries("evt_anomaly_daily")(spark, tmp)
        .select($"event_type", $"z").collect()
        .groupBy(_.getString(0)).map { case (k, rs) =>
          k -> rs.map(r => Option(r.get(1))).toSeq }
      assert(z("solo") == Seq(None), s"single-day stratum: ${z("solo")}")
      assert(z("flat") == Seq(None, None), s"zero-variance stratum: ${z("flat")}")
      assert(z("vary").forall(_.isDefined), s"defined stratum: ${z("vary")}")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("empty input frames produce empty outputs everywhere") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.nearDuplicates(empty, "doc_id", "text").count() == 0)
    assert(Curation.chunkDocs(empty, "doc_id", "text", 5, 3).count() == 0)
    assert(LangModel.bigramPerplexity(empty, "doc_id", "text").count() == 0)
    assert(TextAnalysis.tfidfTopK(empty, "doc_id", "text").count() == 0)
    assert(Curation.repetitionStats(empty, "doc_id", "text").count() == 0)
  }

  test("round-8 operators tolerate empty and degenerate inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.containmentPairs(empty, "doc_id", "text").count() == 0)
    assert(Curation.lineDedup(empty, "doc_id", "text").count() == 0)
    assert(Curation.decontaminateBloom(empty, empty, "doc_id", "text")
      .count() == 0)
    val emptyBin = Seq.empty[(Long, Array[Byte])].toDF("asset_id", "content")
    assert(Multimodal.imageDedup(emptyBin, "asset_id", "content").count() == 0)
    assert(Multimodal.audioDedup(emptyBin, "asset_id", "content").count() == 0)
    val emptyVals = Seq.empty[(String, java.lang.Long)].toDF("g", "v")
    assert(Hll.estimate(emptyVals, Seq("g"), "v").count() == 0)
    assert(CountMin.sketch(emptyVals, "v").count() == 0)
    // NULL/empty text flows through the new text operators without error
    val degenerate = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "   "), (4L, "real words here for a document"))
      .toDF("doc_id", "text")
    assert(Curation.lineDedup(degenerate, "doc_id", "text").count() == 3,
      "NULL text drops (posexplode of null array); empty/blank docs keep a row")
    assert(TextDedup.containmentPairs(degenerate, "doc_id", "text")
      .count() == 0)
  }

  test("round-9 operators tolerate empty and degenerate inputs") {
    import spark.implicits._
    // Quantiles: empty frame, all-filtered frame, single value
    val emptyVals = Seq.empty[(String, java.lang.Long)].toDF("g", "v")
    val qs = Seq("p50" -> 0.5, "p99" -> 0.99)
    assert(Quantiles.quantiles(emptyVals, Seq("g"), "v", qs).count() == 0)
    val allBad = Seq(("a", null.asInstanceOf[java.lang.Long]),
      ("a", java.lang.Long.valueOf(0L)),
      ("a", java.lang.Long.valueOf(-7L))).toDF("g", "v")
    assert(Quantiles.quantiles(allBad, Seq("g"), "v", qs).count() == 0,
      "a group with no positive values has no histogram rows, hence no row")
    val one = Seq(("a", 42L)).toDF("g", "v")
    val r = Quantiles.quantiles(one, Seq("g"), "v", qs).collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) >= 42L && r.getLong(3) >= 42L)

    // CorpusSketch: empty frame, NULL/short texts, single corpus (no pairs)
    val emptyDocs = Seq.empty[(String, String)].toDF("corpus", "text")
    assert(CorpusSketch.estimateJaccard(emptyDocs, "corpus", "text").count() == 0)
    val messyDocs = Seq(
      ("x", null.asInstanceOf[String]), ("x", ""), ("x", "one two"),
      ("x", "three words long enough here")).toDF("corpus", "text")
    assert(CorpusSketch.estimateJaccard(messyDocs, "corpus", "text").count() == 0,
      "a single corpus yields no pairs; degenerate docs don't crash")
    assert(CorpusSketch.signature(messyDocs, "corpus", "text").count() > 0)

    // weightedSample: empty frame, all-excluded weights, k > group size
    val emptyW = Seq.empty[(String, Long, java.lang.Double)].toDF("s", "id", "w")
    assert(Curation.weightedSample(emptyW, "s", "id", "w", k = 3).count() == 0)
    val excluded = Seq(("a", 1L, java.lang.Double.valueOf(0.0)),
      ("a", 2L, null.asInstanceOf[java.lang.Double])).toDF("s", "id", "w")
    assert(Curation.weightedSample(excluded, "s", "id", "w", k = 3).count() == 0)
    val two = Seq(("a", 1L, java.lang.Double.valueOf(1.0)),
      ("a", 2L, java.lang.Double.valueOf(2.0))).toDF("s", "id", "w")
    assert(Curation.weightedSample(two, "s", "id", "w", k = 10).count() == 2,
      "k larger than the stratum returns every eligible row")
  }

  test("round-9 second-wave operators tolerate empty and degenerate inputs") {
    import spark.implicits._
    // resampleWithFill: empty frame, all-NULL values
    val emptyTs = Seq.empty[(Long, java.sql.Timestamp, java.lang.Double)]
      .toDF("k", "ts", "v")
    assert(Temporal.resampleWithFill(emptyTs, "k", "ts", "v",
      86400000000L).count() == 0)

    // Scd: empty change stream; a key whose FIRST event is a delete
    val emptyCh = Seq.empty[(Long, Long, String, java.sql.Timestamp)]
      .toDF("k", "id", "op", "ts")
    assert(graft.cdc.Scd.history(emptyCh, Seq("k"), "ts", "id", "op")
      .count() == 0)
    val delFirst = Seq(
      (1L, 1L, "d", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 2L, "c", java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("k", "id", "op", "ts")
    val h = graft.cdc.Scd.history(delFirst, Seq("k"), "ts", "id", "op")
      .collect()
    assert(h.length == 1 && h.head.getAs[Long]("id") == 2L,
      "an orphan delete contributes no version; the later create does")

    // cumulativeEstimate: empty frame, single period
    val emptyEv = Seq.empty[(Int, java.lang.Long)].toDF("per", "v")
    assert(Hll.cumulativeEstimate(emptyEv, "per", "v").count() == 0)
    val onePer = Seq((1, 7L), (1, 8L)).toDF("per", "v")
    assert(Hll.cumulativeEstimate(onePer, "per", "v").count() == 1)

    // freq_items on an empty / all-NULL frame: empty summary, no rows
    val emptyItems = Seq.empty[java.lang.Long].toDF("item")
    assert(emptyItems
      .agg(graft.functions.FreqItems.freq_items($"item", 8).as("sk"))
      .select(explode($"sk")).count() == 0)

    // Profiler on a frame where every requested column is all-NULL is
    // covered in ProfilerSpec; Bucketing rejects buckets < 1 eagerly
    intercept[IllegalArgumentException] {
      Bucketing.bucketTable(emptyTs, "never_created", "/tmp/never", "k", 0)
    }
  }

  test("round-10 third-wave operators tolerate empty and degenerate inputs") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("g", "v")
    val some = Seq(("g", 5L), ("g", 9L)).toDF("g", "v")

    // drift of anything against an empty snapshot: groups survive with
    // n_b = 0 and NULL statistics; empty-vs-empty is an empty frame
    val oneSided = Drift.histogramDrift(some, empty, Seq("g"), "v").collect()
    assert(oneSided.length == 1 && oneSided.head.getAs[Long]("n_b") == 0L)
    assert(oneSided.head.isNullAt(oneSided.head.fieldIndex("tv")))
    assert(Drift.histogramDrift(empty, empty, Seq("g"), "v").count() == 0)
    // all values non-positive: filtered by the histogram contract
    val nonPos = Seq(("g", 0L), ("g", -3L)).toDF("g", "v")
    assert(Drift.histogramDrift(nonPos, some, Seq("g"), "v")
      .head.getAs[Long]("n_a") == 0L)
    // categorical drift with every category NULL on one side
    val nullCat = Seq(("g", null: String)).toDF("g", "c")
    val catSide = Seq(("g", "x")).toDF("g", "c")
    val cd = Drift.categoryDrift(nullCat, catSide, Seq("g"), "c").collect()
    assert(cd.length == 1 && cd.head.getAs[Long]("n_a") == 0L)

    // KMV difference: empty minus something, something minus empty
    val skSome = Kmv.sketch(some.select($"v"), Nil, "v", 64)
    val skEmpty = Kmv.sketch(empty.select($"v"), Nil, "v", 64)
    val dEmpty = Kmv.differenceEstimate(skEmpty, skSome, 64).head
    assert(dEmpty.getAs[Long]("n_cand") == 0L &&
      dEmpty.getAs[Double]("est_diff") == 0.0)
    val dAll = Kmv.differenceEstimate(skSome, skEmpty, 64).head
    assert(dAll.getAs[Double]("est_diff") == 2.0)

    // hopping windows on an empty frame
    val emptyEvts = Seq.empty[(String, java.sql.Timestamp, Long)]
      .toDF("k", "ts", "v")
    assert(Temporal.hoppingAggregate(emptyEvts, "k", "ts", $"v",
      "1 hour", "15 minutes").count() == 0)

    // profileDiff where one side is an EMPTY PROFILE (zero columns) and
    // where a column is all-NULL on one side
    val profSome = Profiler.columnStats(some, Seq("v"), withExact = true)
    val profEmptyFrame = profSome.limit(0)
    val pd = Profiler.profileDiff(profSome, profEmptyFrame).collect()
    assert(pd.length == 1 && pd.head.getAs[String]("status") == "removed")
    val allNull = Seq.empty[Option[Long]].toDF("v")
      .unionByName(Seq(Option.empty[Long], Option.empty[Long]).toDF("v"))
    val pd2 = Profiler.profileDiff(profSome,
      Profiler.columnStats(allNull, Seq("v"), withExact = true)).head
    assert(pd2.getAs[String]("status") == "common")
    assert(pd2.getAs[Double]("null_shift") == 1.0)
    assert(pd2.getAs[Double]("ndv_ratio") == 0.0)

    // suppression: empty frame; single row per key always emits
    val emptySup = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("k", "ts", "id", "v")
    assert(graft.cdc.Suppress.suppressUnchanged(emptySup, "k", "ts", "id",
      Seq("v")).count() == 0)
    val single = Seq((1L, new java.sql.Timestamp(0L), 1L, "x"))
      .toDF("k", "ts", "id", "v")
    assert(graft.cdc.Suppress.suppressUnchanged(single, "k", "ts", "id",
      Seq("v")).count() == 1)
  }
}
