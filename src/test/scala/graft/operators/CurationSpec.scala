package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("wordGrams yields space-joined n-grams, empty below n words") {
    import spark.implicits._
    val got = Seq("a b c d", "a b", "a", "").toDF("t")
      .select(Curation.wordGrams(split($"t", " ", -1), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(
      List("a b c", "b c d"),
      Nil,
      Nil,
      Nil))
  }

  test("repetitionStats matches hand-computed fractions") {
    import spark.implicits._
    // doc 1: "x y x y x y" (n_chars=11) — 2-grams: "x y"×3, "y x"×2 →
    //   top2 = 3·3/11; 3-grams: "x y x"×2 = "y x y"×2, tie → "x y x" →
    //   top3 = 2·5/11; 5-grams both unique → dup5 = 0
    // doc 2: "a a a a a a" (n_chars=11) — "a a"×5 → top2 = 5·3/11;
    //   "a a a"×4 → top3 = 4·5/11; the one 5-gram "a a a a a" ×2 → dup5 = 1
    // doc 3: "q w" (n_chars=3) — top2 = 1·3/3 = 1; no 3-/5-grams → zeros
    val df = Seq(
      (1L, "x y x y x y"),
      (2L, "a a a a a a"),
      (3L, "q w")).toDF("doc_id", "text")
    val got = Curation.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(0) == ((1L, r6(9.0 / 11), r6(10.0 / 11), 0.0)))
    assert(got(1) == ((2L, r6(15.0 / 11), r6(20.0 / 11), 1.0)))
    assert(got(2) == ((3L, 1.0, 0.0, 0.0)))
  }

  test("repetitionStats breaks top-gram ties by gram ascending") {
    import spark.implicits._
    // "b a b a" 2-grams: "b a"×2, "a b"×1 → top = "b a".
    // "c d c d e c d" would tie... craft an exact tie: "a b c a b c" has
    // "a b"×2, "b c"×2, "c a"×1 → tie between "a b" and "b c" → "a b" wins
    val df = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val got = Curation.repetitionStats(df, "doc_id", "text").collect()(0)
    // top2_frac = 2 * len("a b")=3 / 11
    assert(got.getDouble(1) == math.rint(6.0 / 11 * 1e6) / 1e6)
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    import spark.implicits._
    val df = spark.range(10000)
      .select($"id".as("doc_id"),
        when($"id" % 2 === 0, "en").otherwise("de").as("lang"))
    val rates = Map("en" -> 0.25)
    val s1 = Curation.stratifiedSample(df, "doc_id", "lang", rates, 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    val s2 = Curation.stratifiedSample(df, "doc_id", "lang", rates, 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2, "same input must sample identically")
    val byLang = Curation.stratifiedSample(df, "doc_id", "lang", rates, 0.5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5000 per stratum; thresholds are exact on the first hex byte, so the
    // expectation is rate ± binomial noise (~3σ ≈ 2%)
    assert(math.abs(byLang("en") / 5000.0 - 0.25) < 0.03, s"en rate ${byLang("en")}")
    assert(math.abs(byLang("de") / 5000.0 - 0.50) < 0.03, s"de rate ${byLang("de")}")
    // membership is exactly the md5-prefix rule (cross-check a few rows)
    val md = java.security.MessageDigest.getInstance("MD5")
    def keep(lang: String, id: Long, thr: String): Boolean = {
      val h = md.digest(s"$lang:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      h.substring(0, 2) < thr
    }
    val sampled = s1.toSet
    (0L until 100L).foreach { id =>
      val lang = if (id % 2 == 0) "en" else "de"
      val thr = if (lang == "en") "40" else "80"
      assert(sampled.contains(id) == keep(lang, id, thr), s"id=$id")
    }
  }

  test("stratifiedSample boundary rates: 1.0 keeps all, 0.0 keeps none") {
    import spark.implicits._
    val df = spark.range(500)
      .select($"id".as("doc_id"), lit("en").as("lang"))
    assert(Curation.stratifiedSample(df, "doc_id", "lang",
      Map.empty, defaultRate = 1.0).count() == 500)
    assert(Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.0), defaultRate = 1.0).count() == 0)
  }

  test("stratifiedSample: NULL strata sample at defaultRate, never vanish") {
    import spark.implicits._
    val df = Seq((1L, Option("en")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("doc_id", "lang")
    val kept = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 1.0)
    assert(kept.count() == 3, "rate 1.0 keeps every row, NULL stratum included")
  }

  test("stratifiedSample: tiny positive rates floor at 1/256, only 0.0 zeroes") {
    import spark.implicits._
    val df = (0L until 2000L).map((_, "en")).toDF("doc_id", "lang")
    val tiny = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.001), defaultRate = 0.5).count()
    // floor threshold "01" keeps md5-prefix "00" rows: ~2000/256 ≈ 8
    assert(tiny > 0 && tiny < 40, s"rate 0.001 floors to 1/256, got $tiny")
    assert(Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.0), defaultRate = 0.5).count() == 0)
  }

  test("decontaminate finds exactly the planted overlaps") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ") // 10 words
    val docs = Seq(
      (0L, s"$shared unique0 filler a b c"), // bench (id % 50 == 0)
      (1L, s"prefix1 $shared suffix1"), // train, shares 8-grams with 0
      (2L, "totally different words here nothing shared at all longer than eight"),
      (50L, "another bench doc with its own content words one two three"),
      (51L, s"also $shared trailing")) // train, shares with 0 only
      .toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" % 50 === 0)
    val train = docs.filter($"doc_id" % 50 =!= 0)
    val got = Curation.decontaminate(train, bench, "doc_id", "text", n = 8)
      .orderBy("train_id", "bench_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // "tok1..tok10" contains 3 distinct word-8-grams (positions 1..3), all
    // shared between docs 0, 1 and 51; no other pair overlaps
    assert(got == List((1L, 0L, 3L), (51L, 0L, 3L)))
  }

  test("chunkDocs: stride windows cover the doc, overlap is exact, empty is safe") {
    import spark.implicits._
    val docs = Seq((0L, "abcdefghij"), (1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val got = Curation.chunkDocs(docs, "doc_id", "text", chunkChars = 5,
        strideChars = 3)
      .orderBy($"doc_id", $"chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 0 (len 10): ceil(10/3)=4 chunks at offsets 1,4,7,10
    assert(got.toSeq == Seq(
      (0L, 0L, 1L, "abcde"), (0L, 1L, 4L, "defgh"),
      (0L, 2L, 7L, "ghij"), (0L, 3L, 10L, "j"),
      (1L, 0L, 1L, "abc")), got.mkString(", "))
    // reassembly: stripping the overlap from every non-first chunk
    // reconstructs the document exactly
    val rebuilt = got.filter(_._1 == 0L).map { case (_, i, _, c) =>
      if (i == 0) c else c.drop(5 - 3)
    }.mkString
    assert(rebuilt == "abcdefghij")
  }

  test("chunkDocs is a pure scan-side explode: no shuffle in the plan") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = Curation.chunkDocs(docs, "doc_id", "text", 200, 120)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("topGramCoverage(2) equals repetitionStats' top2_frac on the corpus") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val light = Curation.topGramCoverage(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = Curation.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(light == full)
  }

  test("tokenBudgetMix: under-budget sources pass whole, over-budget downsample") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // srcA: 200 docs x 10 tokens = 2000 tokens (2x budget -> rate ~0.5)
    // srcB: 20 docs x 10 tokens = 200 tokens (under budget -> all kept)
    val docs = ((0 until 200).map(i => (i.toLong, "srcA", 10L)) ++
      (0 until 20).map(i => (1000L + i, "srcB", 10L)))
      .toDF("doc_id", "source", "n_tok")
    val kept = Curation.tokenBudgetMix(docs, "doc_id", "source", "n_tok", 1000L)
    val bySrc = kept.groupBy($"source")
      .agg(count(lit(1)).as("n"), max($"_rate_q").as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(bySrc("srcB") == (20L, 65536), s"under-budget must keep all: $bySrc")
    val (nA, qA) = bySrc("srcA")
    assert(qA == 32768, s"rate 0.5 quantizes to 32768/65536: $qA")
    // md5 prefixes are uniform: expect ~100 of 200 kept, generous margin
    assert(nA > 60 && nA < 140, s"srcA kept $nA of 200 at rate 0.5")
    // deterministic: second run keeps the identical id set
    val ids1 = kept.select($"doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.tokenBudgetMix(docs, "doc_id", "source", "n_tok", 1000L)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("tokenBudgetMix clamps the rate floor: huge sources downsample, never zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 21 docs x 7M tokens = 1.47e8 tokens at budget 1000: the unclamped
    // quantization rounds to 0/65536 (threshold '0000', keeps NOTHING);
    // the floor clamp keeps rate_q = 1, i.e. md5 prefix '0000' survives
    def prefix(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(s"srcZ:$id".getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString
    val lucky = (0L to 300000L).find(i => prefix(i) == "0000").get
    val fillers = Iterator.from(1000000).map(_.toLong)
      .filter(i => prefix(i) != "0000").take(20).toSeq
    val docs = (fillers :+ lucky).map(i => (i, "srcZ", 7000000L))
      .toDF("doc_id", "source", "n_tok")
    val kept = Curation.tokenBudgetMix(docs, "doc_id", "source", "n_tok", 1000L)
      .collect()
    assert(kept.map(r => r.getLong(r.fieldIndex("doc_id"))).toSet == Set(lucky),
      s"only the '0000'-prefix doc survives the floor rate")
    assert(kept.head.getInt(kept.head.fieldIndex("_rate_q")) == 1)
  }

  test("tokenBudgetMix: NULL sources form their own stratum, never silently dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // before the null-safe key fix, md5(concat(source, ...)) null-propagated
    // and the equi-join dropped the NULL key: every NULL-source row vanished
    // at ANY rate — the contract is "downsampled, never silently zeroed"
    val docs = ((0 until 30).map(i => (i.toLong, null.asInstanceOf[String], 10L)) ++
      (0 until 20).map(i => (1000L + i, "srcB", 10L)))
      .toDF("doc_id", "source", "n_tok")
    val kept = Curation.tokenBudgetMix(docs, "doc_id", "source", "n_tok", 1000L)
    val bySrc = kept.groupBy($"source")
      .agg(count(lit(1)).as("n"), max($"_src_tokens").as("t"))
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    // both strata are under budget: every row passes, including NULL source
    assert(bySrc(None) == (30L, 300L), s"NULL stratum must keep all: $bySrc")
    assert(bySrc(Some("srcB")) == (20L, 200L), s"got $bySrc")
  }

  test("assignSplits: total partition, ~weights, growth-stable, scan-side") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0L until 2000L).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = Curation.assignSplits(docs, "doc_id", splits)
    val byLabel = labeled.groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.values.sum == 2000, "every row gets exactly one label")
    assert(byLabel("train") > 1500 && byLabel("train") < 1700, s"got $byLabel")
    assert(byLabel("val") > 120 && byLabel("val") < 280, s"got $byLabel")
    // growth stability: the first 500 ids keep their labels when the
    // corpus quadruples (a row's split is a pure function of its id)
    val small = Curation.assignSplits((0L until 500L).toDF("doc_id"),
        "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bigSlice = labeled.filter($"doc_id" < 500)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small == bigSlice)
    // a different salt draws an independent assignment
    val other = Curation.assignSplits(docs, "doc_id", splits, salt = "v2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val same = labeled.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(other != same)
    // scan-side: no exchange in the plan
    assert(!labeled.queryExecution.executedPlan.toString.contains("Exchange"))
    // a split too small for the 1/65536 grid is rejected wherever it
    // sits (zero-width middle split included)
    intercept[IllegalArgumentException] {
      Curation.assignSplits(docs, "doc_id",
        Seq("a" -> 1.0, "b" -> 1e-9))
    }
    intercept[IllegalArgumentException] {
      Curation.assignSplits(docs, "doc_id",
        Seq("a" -> 0.8, "b" -> 1e-9, "c" -> 0.2))
    }
    // NULL ids hash as "" and land in ONE deterministic split — the
    // partition stays total (no NULL label, no silent drop)
    val withNull = Seq(Option(1L), Option(2L), Option.empty[Long])
      .toDF("doc_id")
    val nullLabel = Curation.assignSplits(withNull, "doc_id", splits)
      .filter($"doc_id".isNull).collect()
    assert(nullLabel.length == 1 && !nullLabel.head.isNullAt(1),
      s"NULL id must still get a split: ${nullLabel.toSeq}")
  }

  test("temperatureMix: alpha=1 is proportional (uniform rate), alpha=0 flattens to uniform targets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // srcBig: 400 docs x 10 tok = 4000; srcSmall: 25 docs x 10 tok = 250
    val docs = ((0 until 400).map(i => (i.toLong, "srcBig", 10L)) ++
      (0 until 25).map(i => (10000L + i, "srcSmall", 10L)))
      .toDF("doc_id", "source", "n_tok")
    def rates(alpha: Double, budget: Long): Map[String, Int] =
      Curation.temperatureMix(docs, "doc_id", "source", "n_tok", budget, alpha)
        .groupBy($"source").agg(max($"_rate_q").as("q"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // alpha=1: p_i proportional to tokens => rate = B/total for EVERY
    // source (2125/4250 = 0.5 -> 32768)
    val r1 = rates(alpha = 1.0, budget = 2125L)
    assert(r1("srcBig") == 32768 && r1("srcSmall") == 32768, s"got $r1")
    // alpha=0: equal targets B/k = 500 per source: srcSmall (250 tokens)
    // caps at rate 1 and passes WHOLE; srcBig downsamples to 500/4000
    val r0 = rates(alpha = 0.0, budget = 1000L)
    assert(r0("srcSmall") == 65536, s"small source must cap at 1: $r0")
    assert(r0("srcBig") == 8192, s"big source flattens to 500/4000: $r0")
    val keptSmall = Curation.temperatureMix(docs, "doc_id", "source",
        "n_tok", 1000L, 0.0)
      .filter($"source" === "srcSmall").count()
    assert(keptSmall == 25, "rate-1 stratum keeps every row")
  }

  test("temperatureMix: NULL source is its own stratum and alpha in (0,1) lands between") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = ((0 until 100).map(i => (i.toLong, "srcA", 10L)) ++
      (0 until 25).map(i => (10000L + i, null.asInstanceOf[String], 10L)))
      .toDF("doc_id", "source", "n_tok")
    val got = Curation.temperatureMix(docs, "doc_id", "source", "n_tok",
        totalBudget = 625L, alpha = 0.5)
      .groupBy($"source").agg(max($"_rate_q").as("q"), count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getInt(1)).toMap
    // shares 1000:250 flatten to sqrt: w = 31.62:15.81 -> p = 2/3:1/3 ->
    // targets 416.7:208.3 -> rates 0.4167:0.8333 (between the alpha=1
    // rate 0.5 and the alpha=0 cap); NULL stratum present, not dropped
    assert(got.contains(None), s"NULL stratum must survive: $got")
    assert(got(Some("srcA")) == math.round(625.0 * (2.0 / 3) / 1000 * 65536).toInt,
      s"got $got")
    assert(got(None) == math.round(625.0 * (1.0 / 3) / 250 * 65536).toInt,
      s"got $got")
  }

  test("tokenBudgetMix rate table broadcasts; no extra shuffle on the kept side") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"source",
        size(split($"text", " ", -1)).cast("bigint").as("n_tok"))
    val plan = Curation.tokenBudgetMix(docs, "doc_id", "source", "n_tok", 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("decontaminateBloom returns exactly decontaminate's result") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, s"$shared unique0 filler a b c"),
      (1L, s"prefix1 $shared suffix1"),
      (2L, "totally different words here nothing shared at all longer than eight"),
      (50L, "another bench doc with its own content words one two three"),
      (51L, s"also $shared trailing"))
      .toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" % 50 === 0)
    val train = docs.filter($"doc_id" % 50 =!= 0)
    val exact = Curation.decontaminate(train, bench, "doc_id", "text", n = 8)
      .orderBy("train_id", "bench_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val bloom = Curation.decontaminateBloom(train, bench, "doc_id", "text", n = 8)
      .orderBy("train_id", "bench_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(bloom == exact)
    assert(bloom == List((1L, 0L, 3L), (51L, 0L, 3L)))
  }

  test("decontaminateBloom prunes scan-side via might_contain; empty bench is empty") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i"), (2L, "j k l m n o p q r"))
      .toDF("doc_id", "text")
    val plan = Curation.decontaminateBloom(docs, docs.limit(1), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    val empty = Curation.decontaminateBloom(
      docs, docs.filter(lit(false)), "doc_id", "text").count()
    assert(empty == 0L)
  }

  test("decontaminateBloom lifts the runtime bloom clamps for its build, then restores them") {
    import spark.implicits._
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val docs = Seq((0L, "tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8 tail"),
      (1L, "tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8 other"))
      .toDF("doc_id", "text")
    val origItems = spark.conf.get(itemsKey)
    val origBits = spark.conf.get(bitsKey)
    try {
      // simulate the clamp regime: confs far below the requested sizing
      spark.conf.set(itemsKey, "8")
      spark.conf.set(bitsKey, "64")
      // expectedGrams >> clamp: without the lift the realized filter would
      // be 64 bits for a requested ~10M-bit build; either way the confirm
      // join keeps correctness — the assert here is contract restoration
      val got = Curation.decontaminateBloom(docs.filter($"doc_id" === 0L),
          docs.filter($"doc_id" === 1L), "doc_id", "text",
          expectedGrams = 1000000L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toList
      assert(got == List((0L, 1L)))
      assert(spark.conf.get(itemsKey) == "8", "maxNumItems must be restored")
      assert(spark.conf.get(bitsKey) == "64", "maxNumBits must be restored")
    } finally {
      spark.conf.set(itemsKey, origItems)
      spark.conf.set(bitsKey, origBits)
    }
  }

  test("autoMinDf: calibrated floor at the paper's 2 through gate scales, then linear") {
    assert(Curation.autoMinDf(1L) == 2)
    assert(Curation.autoMinDf(500L) == 2)    // sf0.01
    assert(Curation.autoMinDf(5000L) == 2)   // sf0.1 — gate pins stay valid
    assert(Curation.autoMinDf(50000L) == 20) // 10x sweep (measured in scaladoc)
    assert(Curation.autoMinDf(500000L) == 200)
    // monotone non-decreasing, never below the floor
    var last = 0
    for (n <- Seq(10L, 1000L, 10000L, 1000000L, 100000000L)) {
      val m = Curation.autoMinDf(n)
      assert(m >= 2 && m >= last, s"autoMinDf($n) = $m regressed")
      last = m
    }
  }

  test("lineDedup minDf<=0 resolves to auto; identical to the pinned 2 at gate scale") {
    import spark.implicits._
    val docs = Seq(
      (1L, "HDR\nunique one\nshared"),
      (2L, "HDR\nunique two\nshared"),
      (3L, "HDR\nunique three"))
      .toDF("doc_id", "text")
    def run(minDf: Int, nHint: Long = 0L) = Curation
      .lineDedup(docs, "doc_id", "text", minDf = minDf, nHint = nHint)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toList
    val pinned = run(2)
    assert(run(0) == pinned, "auto at 3 docs must resolve to the floor 2")
    assert(run(0, nHint = 3L) == pinned)
    // an absurd hint pushes auto past every df here: nothing is removed
    val loose = run(0, nHint = 10000000L)
    assert(loose.forall(_._4 == 0L), s"minDf=autoMinDf(10M) must remove nothing: $loose")
  }

  test("lineDedup removes corpus-frequent lines, keeps order, counts exactly") {
    import spark.implicits._
    // "HDR" appears in all 3 docs (df=3 >= minDf=2 -> removed);
    // "shared" in docs 1+2 (df=2 -> removed); within-doc repeat of "only1"
    // counts ONCE for df, so it survives (df=1) — both copies kept.
    val docs = Seq(
      (1L, "HDR\nonly1\nshared\nonly1\nTAIL1"),
      (2L, "HDR\nshared\nTAIL2"),
      (3L, "HDR"))
      .toDF("doc_id", "text")
    val got = Curation.lineDedup(docs, "doc_id", "text", minDf = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(got == List(
      (1L, "only1\nonly1\nTAIL1", 3L, 2L),
      (2L, "TAIL2", 1L, 2L),
      (3L, "", 0L, 1L)))
  }

  test("lineDedup treats the delimiter literally and keeps empty lines distinct") {
    import spark.implicits._
    // '.' must not act as regex-any; empty lines dedup like any other line.
    val docs = Seq((1L, "a.b..a"), (2L, "c..d")).toDF("doc_id", "text")
    val got = Curation.lineDedup(docs, "doc_id", "text", delim = ".", minDf = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toList
    // doc1 lines: a, b, "", a ; doc2: c, "", d — "" in both docs -> removed
    assert(got == List((1L, "a.b.a", 3L, 1L), (2L, "c.d", 2L, 1L)))
  }

  test("weightedSample equals the window-rank formulation; excludes non-positive weights") {
    import spark.implicits._
    val rows = (1L to 400L).map(i =>
      (s"s${i % 4}", i, if (i % 50 == 0) 0L else (i % 13) * 100 + 1)) ++
      Seq(("s0", 401L, -5L)) // negative weight: excluded
    val df = rows.toDF("src", "id", "w")
    val got = Curation.weightedSample(df, "src", "id", "w", k = 5, salt = "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // reference: same key, ranked by a window
    val hex = substring(md5(concat(lit("t"), $"id".cast("string"))), 1, 13)
    val u = (conv(hex, 16, 10).cast("double") + lit(0.5)) / lit(4503599627370496.0)
    val key = log(u) / $"w".cast("double")
    val ref = df.filter($"w" > 0)
      .withColumn("key", key)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"src")
          .orderBy($"key".desc, $"id")))
      .filter($"rnk" <= 5)
      .select($"src", $"rnk".cast("bigint"), $"id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
    assert(!got.exists(_._3 == 401L), "negative-weight row must never be drawn")
    assert(!got.exists(t => t._3 % 50 == 0), "zero-weight rows must never be drawn")
  }

  test("weightedSample inclusion tracks weight: heavy rows dominate across salts") {
    import spark.implicits._
    // two weight classes, 10x apart; over many independent draws (salts)
    // the heavy class must win most of the k slots
    val df = (1L to 200L).toDF("id")
      .withColumn("src", lit("all"))
      .withColumn("w", when($"id" <= 100L, 10.0).otherwise(1.0))
    val heavyShare = (1 to 20).map { s =>
      val picked = Curation.weightedSample(df, "src", "id", "w", k = 20,
        salt = s"salt$s").collect().map(_.getLong(2))
      picked.count(_ <= 100L)
    }.sum / (20.0 * 20.0)
    // E[heavy share] ~ 10/11 with k << n; require well above parity
    assert(heavyShare > 0.75, s"heavy share $heavyShare")
  }

  test("weightedSample plan is windowless (bounded-heap aggregate, no sort)") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id")
      .withColumn("src", lit("a")).withColumn("w", lit(1.0))
    val plan = Curation.weightedSample(df, "src", "id", "w", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window found in plan:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected heap aggregate:\n$plan")
  }

  test("cluster-keyed splits: zero near-dup leakage by construction") {
    import spark.implicits._
    // 40 planted identical pairs (per-pair vocabularies, so each pair is
    // its own cluster) + 20 singletons
    val docs = (0 until 40).flatMap { p =>
      val text = (0 until 12).map(w => s"p${p}w$w").mkString(" ")
      Seq((p * 2L, text), (p * 2L + 1L, text))
    } ++ (0 until 20).map(i =>
      (1000L + i, (0 until 12).map(w => s"s${i}w$w").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val pairs = TextDedup.nearDuplicates(df, "doc_id", "text",
      threshold = 0.8).select($"id_a", $"id_b").localCheckpoint(true)
    assert(pairs.count() === 40)
    val clusters = graft.operators.Components.connectedComponents(pairs)
    val keyed = df.select($"doc_id")
      .join(clusters.select($"id".as("doc_id"), $"component"),
        Seq("doc_id"), "left")
      .withColumn("split_key", coalesce($"component", $"doc_id"))
    def leaks(sp: org.apache.spark.sql.DataFrame): Long = pairs
      .join(sp.select($"doc_id".as("id_a"), $"split".as("sa")), "id_a")
      .join(sp.select($"doc_id".as("id_b"), $"split".as("sb")), "id_b")
      .filter($"sa" =!= $"sb").count()
    // per-doc assignment provably leaks on this fixture...
    val perDoc = Curation.assignSplits(df.select($"doc_id"), "doc_id",
      splits, salt = "v1")
    assert(leaks(perDoc) > 0, "fixture must leak under per-doc assignment")
    // ...cluster-keyed assignment cannot: one key per cluster
    val byCluster = Curation.assignSplits(keyed, "split_key", splits,
      salt = "v1")
    assert(leaks(byCluster) === 0)
    // still a total partition: every doc labeled exactly once
    assert(byCluster.select($"doc_id").distinct().count() === docs.size)
    assert(byCluster.count() === docs.size)
  }

  test("decontaminateSemantic equals the brute-force cross cosine; " +
      "non-positive thresholds refused") {
    import spark.implicits._
    def vec(seed: Long): Seq[Float] = Seq.tabulate(8)(i =>
      (((seed * 31 + i * 17) % 13) - 6).toFloat)
    val train = (1L to 30L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    // bench 101 is train 7's exact vector (cos 1), bench 102 unrelated
    val bench = Seq((101L, vec(7L)), (102L, vec(1000L)))
      .toDF("vec_id", "embedding")
    val got = Curation.decontaminateSemantic(train, bench,
        "vec_id", "embedding", minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute-force model
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      d / (na * nb)
    }
    val want = for {
      (ti, tv) <- (1L to 30L).map(i => (i, vec(i)))
      (bi, bv) <- Seq((101L, vec(7L)), (102L, vec(1000L)))
      s = cos(tv, bv) if s >= 0.9
    } yield (ti, bi, s)
    assert(got.map(t => (t._1, t._2)).toSet === want.map(t => (t._1, t._2)).toSet)
    // the planted exact copy: cosine ~1 (sqrt(d)*sqrt(d) != d in IEEE,
    // so not exactly 1.0)
    assert(got.exists(t => t._1 == 7L && t._2 == 101L && t._3 > 0.999999))
    intercept[IllegalArgumentException] {
      Curation.decontaminateSemantic(train, bench, "vec_id", "embedding",
        minSim = 0.0)
    }
  }

  test("decontaminateSemanticAnn: full probe equals the broadcast form " +
      "bit-exactly; planted paraphrases survive pruned probes at full " +
      "recall; the bench vectors are never broadcast") {
    import spark.implicits._
    // bench: 8 well-separated direction vectors (dense 0-based ids for
    // the strided k-means init); train: one near-paraphrase per bench
    // vector (tiny per-dim jitter) + 24 unrelated vectors
    def unit(dir: Int): Seq[Float] =
      Seq.tabulate(16)(i => if (i == dir * 2) 10f else (i % 3 - 1) * 0.1f)
    val bench = (0 until 8).map(d => (d.toLong, unit(d))).toDF("vec_id", "embedding")
    val train = ((0 until 8).map(d =>
      (100L + d, unit(d).updated(1, 0.3f))) ++
      (0 until 24).map(j => (200L + j,
        Seq.tabulate(16)(i => ((i * 7 + j * 13) % 11 - 5).toFloat))))
      .toDF("vec_id", "embedding")
    val table = "graft_annd_spec"
    Seq(table, s"${table}_centroids").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    val tmp = java.nio.file.Files.createTempDirectory("anndspec").toString
    val bkey = "spark.sql.autoBroadcastJoinThreshold"
    val oldB = spark.conf.get(bkey)
    try {
      AnnIndex.ivfIndex(bench, "vec_id", "embedding", k = 4,
        table, s"$tmp/idx")
      spark.conf.set(bkey, "-1") // broadcasts must be CHOSEN, not AQE
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSet
      val brute = pairs(Curation.decontaminateSemantic(train, bench,
        "vec_id", "embedding", minSim = 0.9))
      // full probe (nprobe = k): bit-exact equality with the broadcast form
      val full = Curation.decontaminateSemanticAnn(train, "vec_id",
        "embedding", table, minSim = 0.9, nprobe = 4)
      assert(pairs(full) === brute)
      assert(brute.nonEmpty && brute.map(t => (t._1, t._2)) ===
        (0 until 8).map(d => (100L + d, d.toLong)).toSet)
      // pruned probe: every planted paraphrase still found (its nearest
      // centroid is its twin's centroid) — full recall at nprobe 1
      val pruned = Curation.decontaminateSemanticAnn(train, "vec_id",
        "embedding", table, minSim = 0.9, nprobe = 1)
      assert(pairs(pruned) === brute, "recall@nprobe=1 on the plant")
      // plan: the index join is a SHUFFLE join; no broadcast subtree
      // carries the bench vectors (only the k-row centroid frame and the
      // probe frame broadcast)
      val plan = full.queryExecution.executedPlan
      val bcastCols = plan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          b.output.map(_.name)
      }.flatten
      assert(!bcastCols.contains("bv") && !bcastCols.contains("bench_id"),
        s"bench vectors must never broadcast, saw: $bcastCols")
      assert(plan.toString.contains("SortMergeJoin") ||
        plan.toString.contains("ShuffledHashJoin"),
        "the label join must shuffle")
      intercept[IllegalArgumentException] {
        Curation.decontaminateSemanticAnn(train, "vec_id", "embedding",
          table, minSim = 0.9, nprobe = 0)
      }
    } finally {
      spark.conf.set(bkey, oldB)
      Seq(table, s"${table}_centroids").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("decontaminateSemantic drops zero-norm vectors instead of " +
      "emitting NaN pairs (ADVICE r12)") {
    import spark.implicits._
    val zero = Seq.fill(8)(0.0f)
    def vec(seed: Long): Seq[Float] = Seq.tabulate(8)(i =>
      (((seed * 31 + i * 17) % 13) - 6).toFloat)
    // zero vectors on BOTH sides: under the unguarded division every
    // (zero, *) pair had sim = 0/0 = NaN, and NaN >= minSim is TRUE in
    // Spark's ordering — the pairs flooded the output
    val train = Seq((1L, vec(1L)), (2L, zero)).toDF("vec_id", "embedding")
    val bench = Seq((101L, vec(1L)), (102L, zero)).toDF("vec_id", "embedding")
    val got = Curation.decontaminateSemantic(train, bench,
        "vec_id", "embedding", minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall(t => !t._3.isNaN), s"NaN pair leaked: ${got.toSeq}")
    assert(got.map(t => (t._1, t._2)).toSet === Set((1L, 101L)))
  }

  test("shuffleShards is a total deterministic permutation: every id " +
      "exactly once, dense 1..n positions per shard, replay-identical, " +
      "salt-independent draws, near-uniform shard sizes, NULL id kept") {
    import spark.implicits._
    val ids = (0L until 2000L).map(Option(_)) :+ Option.empty[Long]
    val df = ids.toDF("doc_id")
    def run(salt: String) = Curation
      .shuffleShards(df, "doc_id", numShards = 16, salt = salt)
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getLong(2)))
    val a = run("epoch-0")
    // total: every id (incl. the NULL row) exactly once
    assert(a.length === 2001 && a.map(_._1).distinct.length === 2001)
    // dense positions 1..n within each shard
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.length).toArray,
        s"shard $shard positions not dense")
    }
    // deterministic replay
    assert(run("epoch-0").sortBy(_._1) === a.sortBy(_._1))
    // a different salt is a fresh permutation (some assignment moved)
    val b = run("epoch-1")
    assert(a.sortBy(_._1).map(t => (t._2, t._3)).toSeq !==
      b.sortBy(_._1).map(t => (t._2, t._3)).toSeq)
    // rough uniformity at n/shards = 125: no empty or doubled shard
    val sizes = a.groupBy(_._2).values.map(_.length)
    assert(sizes.size === 16 && sizes.min > 62 && sizes.max < 250,
      s"shard sizes skewed: $sizes")
    // the ingestion order is actually broken: consecutive ids do not
    // stay consecutive in (shard, pos) order
    val order = a.sortBy(t => (t._2, t._3)).map(_._1).toSeq
    assert(order !== order.sorted)
  }

  test("calibrateScores: a low-scale source's top decile maps to the " +
      "global top midpoint; bins are source-relative; NULL scores drop") {
    import spark.implicits._
    // source A: scores 1..100; source B: scores 1001..1100 (same shape,
    // shifted scale). Per-source bins must IGNORE the shift.
    val rows = (1 to 100).map(i => (i.toLong, "A", i.toDouble)) ++
      (1 to 100).map(i => (i.toLong + 1000, "B", 1000.0 + i)) ++
      Seq((5000L, "A", Double.NaN)) // NaN drops like NULL (no rank)
    val df = rows.toDF("doc_id", "source", "score")
      .union(Seq((6000L, "A")).toDF("doc_id", "source")
        .withColumn("score", lit(null).cast("double")))
    val got = Curation.calibrateScores(df, "doc_id", "source", "score")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(!got.contains(6000L), "NULL score rows drop")
    assert(!got.contains(5000L),
      "NaN score rows drop inside the operator (ADVICE r13 — NaN sorts " +
        "greatest in Spark's exact percentile and would poison the bins)")
    // doc 100 (A's max) and doc 1100 (B's max) sit in bin 9 of their
    // OWN sources and calibrate to the same global midpoint quantile
    assert(got(100L)._2 === 9L && got(1100L)._2 === 9L)
    assert(got(100L)._3 === got(1100L)._3)
    // A's median and B's median land in the same bin despite the shift
    assert(got(50L)._2 === got(1050L)._2)
    // the calibrated value is the global (pooled) mid-quantile: A's top
    // calibrates ABOVE A's own max (the pooled p95 sits in B's range)
    assert(got(100L)._3 > 100.0)
    // strictly-below semantics: a score equal to a boundary stays in
    // the lower bin (score 10 == p0.1 boundary of A's 1..100)
    assert(got(10L)._2 === 0L)
  }

  test("centroidOutliers: a planted inverted member is flagged against " +
      "its group's exact quantized centroid; layout-invariant; a " +
      "zero-norm member flags with NULL cosine") {
    import spark.implicits._
    // group 1: eight near-identical vectors + one INVERTED; group 2:
    // tight cluster elsewhere + one all-zero degenerate
    def v(base: Array[Double], eps: Double) = base.map(x => (x + eps).toFloat)
    val b1 = Array(0.8, 0.1, 0.05, 0.3)
    val b2 = Array(-0.2, 0.7, -0.4, 0.1)
    val rows =
      (0 until 8).map(i => (i.toLong, v(b1, i * 0.001), 1)) ++
        Seq((8L, b1.map(x => (-x).toFloat), 1)) ++
        (10 until 14).map(i => (i.toLong, v(b2, (i - 10) * 0.001), 2)) ++
        Seq((14L, Array(0f, 0f, 0f, 0f), 2))
    val df = rows.toDF("vec_id", "embedding", "label")
    for (parts <- Seq(1, 5)) {
      val got = Curation.centroidOutliers(df.repartition(parts), "vec_id",
          "embedding", "label", minCos = 0.5)
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      assert(got.keySet === Set(8L, 14L), s"parts=$parts: $got")
      assert(got(8L).exists(_ < -0.9),
        "the inverted member sits opposite the centroid")
      assert(got(14L).isEmpty,
        "a zero-norm member flags with NULL, never NaN")
    }
  }
}
