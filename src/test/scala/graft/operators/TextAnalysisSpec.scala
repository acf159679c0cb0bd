package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("langId identifies stopword-profiled languages and CJK script") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy that the sun was out"),
      ("es", "el perro corre por la calle y los gatos duermen en una casa con el sol"),
      ("fr", "le chat dort dans la maison et les oiseaux chantent pour une belle matinee"),
      ("de", "der hund lauft durch die stadt und das wetter ist schon mit ein wenig wind"),
      ("zh", "今天天气很好我们一起去公园散步然后吃午饭"),
      ("und", "xqz blorp fnord zzyzx"))
      .toDF("expected", "text")
    val got = samples
      .select($"expected", TextAnalysis.langId($"text").as("got"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (exp, act) => assert(act == exp, s"expected $exp got $act") }
  }

  test("codegen LangIdExpr matches the HOF reference on the corpus") {
    import spark.implicits._
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"text")
      .union(Seq("", " ", "la de", "der die the and", "中文中文 short").toDF("text"))
    val mismatches = d
      .select(TextAnalysis.langId($"text").as("fast"),
        TextAnalysis.langIdReference($"text").as("ref"))
      .filter(!($"fast" <=> $"ref"))
      .count()
    assert(mismatches == 0)
  }

  test("quality score rewards fluent text over noise") {
    import spark.implicits._
    val df = Seq(
      ("good", "the quick brown fox jumps over the lazy dog " * 6),
      ("noise", "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"))
      .toDF("kind", "text")
    val q = df.select($"kind", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(q("good") > 0.8)
    assert(q("noise") < 0.5)
    assert(q("good") > q("noise"))
  }

  test("bpe token count splits letter runs, digits and marks") {
    import spark.implicits._
    val n = Seq("Hello, world! v2.0")
      .toDF("text")
      .select(TextAnalysis.bpeTokenCount($"text").as("n"))
      .collect().head.getInt(0)
    // hello , world ! v 2 . 0  => 8
    assert(n == 8)
  }

  test("winnowing: shared long substring implies shared fingerprint; short text empty") {
    import spark.implicits._
    val common = "abcdefghijklmnopqrstuvwxyz0123456789"
    val df = Seq(
      (1, s"PREFIX $common SUFFIX-ONE"),
      (2, s"completely-other-start $common another-tail"),
      (3, "nothing in common with the others at all, different content"),
      (4, "tiny"))
      .toDF("id", "text")
      .select($"id", TextAnalysis.winnowingFingerprint($"text").as("fp"))
    val fp = df.collect().map(r => r.getInt(0) -> r.getSeq[String](1).toSet).toMap
    assert((fp(1) & fp(2)).nonEmpty, "shared 36-char substring must share a fingerprint")
    assert((fp(1) & fp(3)).isEmpty)
    assert(fp(4).isEmpty)
  }

  test("tfidfTopK matches a hand-computed model; corpus-wide terms score 0") {
    import spark.implicits._
    val docs = Seq((0L, "a a b"), (1L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 2)
      .orderBy($"doc_id", $"rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val ln2 = math.round(math.log(2.0) * 1e6) / 1e6
    // df(a)=2 of N=2 docs -> idf 0; b and c are distinctive
    assert(got.toSeq == Seq(
      (0L, 1L, "b", ln2), (0L, 2L, "a", 0.0),
      (1L, 1L, "c", ln2), (1L, 2L, "a", 0.0)), got.mkString(", "))
  }

  test("tfidfTopK on the corpus: k rows per doc, terms come from the doc") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val out = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
    val perDoc = out.groupBy($"doc_id").count()
      .filter($"count" =!= 3).count()
    assert(perDoc == 0, "every doc has >= 3 distinct terms in this corpus")
    val foreign = out.join(docs, Seq("doc_id"))
      .filter(!array_contains(split($"text", " ", -1), $"term")).count()
    assert(foreign == 0)
  }

  test("tfidfTopK ranks through the bounded-heap aggregate: no Window in the plan") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-doc ranking must not window-sort:\n${plan.take(2000)}")
    // TypedImperativeAggregate plans as ObjectHashAggregate; partial +
    // final stages prove <= k (score, term) pairs per doc cross the shuffle
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("bm25 matches a hand-computed scalar model") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join scan join filter"),          // tf(join)=2, dl=4
      (2L, "scan scan scan scan scan scan"),  // tf(scan)=6, dl=6
      (3L, "filter merge sort"),              // no query term
      (4L, "join"))                           // tf(join)=1, dl=1
      .toDF("doc_id", "text")
    val q = Seq("join", "scan")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // scalar model, identical arithmetic
    val n = 4.0; val sdl = 4.0 + 6.0 + 3.0 + 1.0
    val dfm = Map("join" -> 2.0, "scan" -> 2.0)
    def contrib(term: String, tf: Double, dl: Double): Double = {
      val idf = math.log((n - dfm(term) + 0.5) / (dfm(term) + 0.5) + 1.0)
      idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sdl / n)))
    }
    assert(got.keySet === Set(1L, 2L, 4L),
      "docs without any query term must not appear")
    assert(got(1L) === contrib("join", 2, 4) + contrib("scan", 1, 4))
    assert(got(2L) === 0.0 + contrib("scan", 6, 6)) // no join rows -> exact 0
    assert(got(4L) === contrib("join", 1, 1))
    // rarer-term weighting: with equal df here, more tf in a shorter doc
    // scores higher
    assert(got(4L) < got(1L))
  }

  test("bm25 maintained state: multi-batch merge + compaction + replay " +
      "score the one-shot VERBATIM; a slice keeps the GLOBAL statistics") {
    import spark.implicits._
    val docs = ((1L to 40L).map(i =>
      (i, s"join scan d$i filter w${i % 7} w${i % 11} merge")) ++
      Seq((41L, "vector vector join"), (42L, "scan scan scan scan")))
      .toDF("doc_id", "text")
    val q = Seq("join", "scan", "vector")
    val table = "graft_bm25_spec_state"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val tmp = java.nio.file.Files.createTempDirectory("bm25state").toString
    try {
      // three delta batches on md5 parity
      val part = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 6), 16, 10).cast("long"), lit(3))
      for (i <- 0 until 3)
        TextAnalysis.bm25MergeBatch(docs.filter(part === i), "doc_id",
          "text", table, s"$tmp/state", i.toLong)
      // a replayed batch dynamic-overwrites its own partition: no double
      TextAnalysis.bm25MergeBatch(docs.filter(part === 1), "doc_id",
        "text", table, s"$tmp/state", 1L)
      val oneShot = TextAnalysis.bm25(docs, "doc_id", "text", q)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      def fromState() = TextAnalysis.bm25FromState(docs, "doc_id", "text",
          q, table)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(fromState() === oneShot, "state score must be bit-exact")
      // compaction folds batches 0..1; the score is unchanged
      val (before, after) = TextAnalysis.bm25CompactState(spark, table, 1L)
      assert(before > 0 && after > 0)
      assert(fromState() === oneShot, "compaction must not move a bit")
      // scoring a SLICE keeps the global statistics: doc 42's score is
      // identical whether or not the rest of the corpus is in the frame
      val slice = TextAnalysis.bm25FromState(
          docs.filter(col("doc_id") === 42L), "doc_id", "text", q, table)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(slice === Map(42L -> oneShot(42L)))
      // the one-shot on the slice CANNOT give that (its stats collapse
      // to the slice) — the semantics the state exists for
      val oneShotSlice = TextAnalysis.bm25(
          docs.filter(col("doc_id") === 42L), "doc_id", "text", Seq("scan"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(oneShotSlice(42L) !== oneShot(42L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("zipfFit matches a scalar OLS model; rank ties break by term; " +
      "topN caps the fit; degenerate corpora return NULL fits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // freqs: a=4, b=3, c=2, d=2, e=1 — tie (c,d) must rank c before d
    val docs = Seq((1L, "a a b c d"), (2L, "a b c d e"), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(docs, "doc_id", "text").collect()(0)
    val ranked = Seq(4L, 3L, 2L, 2L, 1L) // a, b, c, d, e after tie-break
    val pts = ranked.zipWithIndex.map { case (f, i) =>
      (math.log(i + 1.0), math.log(f.toDouble)) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val num = n * pts.map(p => p._1 * p._2).sum - sx * sy
    val vx = n * pts.map(p => p._1 * p._1).sum - sx * sx
    val vy = n * pts.map(p => p._2 * p._2).sum - sy * sy
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(got.getLong(0) === 5L)          // terms fitted
    assert(got.getLong(1) === 5L)          // vocab
    assert(got.getLong(2) === 12L)         // tokens
    assert(got.getDouble(3) === r6(num / vx))
    assert(got.getDouble(4) === r6((sy - (num / vx) * sx) / n))
    assert(got.getDouble(5) === r6(num * num / (vx * vy)))
    assert(got.getDouble(3) < 0.0, "zipf slope must be negative")
    // topN caps the fitted ranks (totals stay corpus-exact)
    val capped = TextAnalysis.zipfFit(docs, "doc_id", "text", topN = 3)
      .collect()(0)
    assert(capped.getLong(0) === 3L && capped.getLong(1) === 5L)
    // a single-word corpus has one rank: zero x-variance -> NULL fit
    val flat = TextAnalysis.zipfFit(
      Seq((1L, "x x x")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(flat.getLong(0) === 1L && flat.isNullAt(3) && flat.isNullAt(5))
    // layout invariance at round-6 over the corpus table
    val corpus = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    val a = TextAnalysis.zipfFit(corpus, "doc_id", "text").collect()(0)
    val b = TextAnalysis.zipfFit(corpus.repartition(13), "doc_id", "text")
      .collect()(0)
    assert(a === b)
    // the synthetic corpus is word-salad over a ~30-word vocabulary —
    // near-uniform frequencies, so the curve falls only gently and the
    // fit is POOR (r² ≈ 0.06): exactly the degradation the audit flags
    // on unnatural corpora (natural text sits near slope -1, r² > 0.9)
    assert(a.getDouble(3) < -0.05 && a.getDouble(3) > -1.0)
    assert(a.getDouble(5) >= 0.0 && a.getDouble(5) <= 1.0)
  }

  test("zipfFromState equals the one-shot fit verbatim through batch " +
      "merge and compaction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = ((1L to 30L).map(i =>
      (i, s"the cat w${i % 5} sat on w${i % 7} the mat"))).toDF("doc_id", "text")
    val table = "graft_zipf_spec_state"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val tmp = java.nio.file.Files.createTempDirectory("zipfstate").toString
    try {
      val part = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 6), 16, 10).cast("long"), lit(3))
      for (i <- 0 until 3)
        LangModel.lmMergeBatch(docs.filter(part === i), "doc_id", "text",
          table, s"$tmp/state", i.toLong)
      LangModel.lmCompactState(spark, table, 1L)
      val oneShot = TextAnalysis.zipfFit(docs, "doc_id", "text").collect()(0)
      val fromState = TextAnalysis.zipfFromState(spark, table).collect()(0)
      assert(fromState === oneShot)
      assert(!oneShot.isNullAt(3), "the fixture must actually fit a slope")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("rrfFuse: fixed-order reciprocal sum, absent items contribute 0") {
    import spark.implicits._
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rnk")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rnk")
    val got = Fusion.rrfFuse(Seq(a, b), "doc_id", "rnk")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(10L) === 1.0 / 61)
    assert(got(20L) === 1.0 / 62 + 1.0 / 61)
    assert(got(30L) === 1.0 / 63)
    assert(got(40L) === 1.0 / 62)
    // the consensus item outranks every single-system item
    assert(got(20L) > got(10L))
    intercept[IllegalArgumentException] {
      Fusion.rrfFuse(Seq(a), "doc_id", "rnk")
    }
  }
}
