package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LangModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("hand-computed add-one bigram model on a 2-doc corpus") {
    import spark.implicits._
    val docs = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val got = LangModel.bigramPerplexity(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    // corpus: c2(a b)=3, c2(b a)=1, c2(b c)=1; prefix c1(a)=3, c1(b)=2; V=3
    val logp0 = 2 * math.log(4.0 / 6.0) + math.log(2.0 / 5.0)
    val ce0 = -logp0 / 3.0
    val logp1 = math.log(4.0 / 6.0) + math.log(2.0 / 5.0)
    val ce1 = -logp1 / 2.0
    def r4(x: Double) = math.round(x * 1e4) / 1e4
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 2L))
    assert(got(0).getDouble(2) == r4(ce0) && got(0).getDouble(3) == r4(math.exp(ce0)))
    assert(got(1).getDouble(2) == r4(ce1) && got(1).getDouble(3) == r4(math.exp(ce1)))
  }

  test("documents with fewer than two words score zero, not null") {
    import spark.implicits._
    val docs = Seq((0L, "single"), (1L, "two words")).toDF("doc_id", "text")
    val got = LangModel.bigramPerplexity(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(got(0).getLong(1) == 0L && got(0).getDouble(2) == 0.0 &&
      got(0).getDouble(3) == 0.0)
    assert(got(1).getLong(1) == 1L)
  }

  test("corpus run: every doc scored, n_bigrams = words - 1, sane range") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sf, "documents")
    val out = LangModel.bigramPerplexity(docs, "doc_id", "text")
    assert(out.count() == docs.count())
    val bad = out.join(
        docs.select($"doc_id", (size(split($"text", " ", -1)) - 1).cast("bigint").as("exp_n")),
        Seq("doc_id"))
      .filter($"n_bigrams" =!= $"exp_n").count()
    assert(bad == 0)
    // word-salad corpus over a ~30-word vocabulary: ppl must sit between
    // 1 (degenerate) and the smoothed-uniform ceiling
    val rows = out.agg(min($"ppl"), max($"ppl")).collect()(0)
    assert(rows.getDouble(0) > 5.0 && rows.getDouble(1) < 100.0)
  }

  test("maintained state: multi-batch merge + compaction + replay score " +
      "the one-shot VERBATIM; a slice keeps the GLOBAL model") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = ((1L to 40L).map(i =>
      (i, s"the cat w${i % 7} sat on w${i % 11} the mat")) ++
      Seq((41L, "the the the"), (42L, "cat mat cat mat")))
      .toDF("doc_id", "text")
    val table = "graft_lm_spec_state"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val tmp = java.nio.file.Files.createTempDirectory("lmstate").toString
    try {
      // three delta batches on md5 parity (never id parity)
      val part = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 6), 16, 10).cast("long"), lit(3))
      for (i <- 0 until 3)
        LangModel.lmMergeBatch(docs.filter(part === i), "doc_id", "text",
          table, s"$tmp/state", i.toLong)
      // a replayed batch dynamic-overwrites its own partition: no double
      LangModel.lmMergeBatch(docs.filter(part === 1), "doc_id", "text",
        table, s"$tmp/state", 1L)
      val oneShot = LangModel.bigramPerplexity(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
          r.getDouble(3)))).toMap
      def fromState(d: org.apache.spark.sql.DataFrame) =
        LangModel.bigramPerplexityFromState(d, "doc_id", "text", table)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1),
            r.getDouble(2), r.getDouble(3)))).toMap
      assert(fromState(docs) === oneShot, "state score must equal one-shot")
      // compaction folds batches 0..1; the score is unchanged
      val (before, after) = LangModel.lmCompactState(spark, table, 1L)
      assert(before > 0 && after > 0)
      assert(fromState(docs) === oneShot, "compaction must not move a bit")
      // a slice is judged against the GLOBAL model: doc 42's score is
      // identical whether or not the rest of the corpus is in the frame —
      // the one-shot on the slice cannot give that (its model collapses)
      val slice = fromState(docs.filter(col("doc_id") === 42L))
      assert(slice === Map(42L -> oneShot(42L)))
      val oneShotSlice = LangModel.bigramPerplexity(
          docs.filter(col("doc_id") === 42L), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(oneShotSlice(42L) !== oneShot(42L)._3)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("a NEW document scored from state takes the add-one floor on " +
      "unseen grams instead of dropping them") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val table = "graft_lm_spec_new"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val tmp = java.nio.file.Files.createTempDirectory("lmnew").toString
    try {
      LangModel.lmMergeBatch(corpus, "doc_id", "text", table,
        s"$tmp/state", 0L)
      // corpus model: c2(a b)=3, c2(b a)=1, c2(b c)=1; c1(a)=3, c1(b)=2;
      // V=3. New doc "z a b": gram (z a) unseen -> (0+1)/(0+3); (a b)
      // seen -> (3+1)/(3+3). n_bigrams counts BOTH.
      val got = LangModel.bigramPerplexityFromState(
          Seq((9L, "z a b")).toDF("doc_id", "text"), "doc_id", "text", table)
        .collect()(0)
      val ce = -(math.log(1.0 / 3.0) + math.log(4.0 / 6.0)) / 2.0
      def r4(x: Double) = math.round(x * 1e4) / 1e4
      assert(got.getLong(1) == 2L)
      assert(got.getDouble(2) == r4(ce))
      assert(got.getDouble(3) == r4(math.exp(ce)))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("noveltyFromState: exact unseen counts against the reference " +
      "state; absorbed docs score zero; short docs take a NULL ratio") {
    import spark.implicits._
    val ref = Seq((0L, "a b c a b")).toDF("doc_id", "text")
    val table = "graft_lm_spec_nov"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val tmp = java.nio.file.Files.createTempDirectory("lmnov").toString
    try {
      LangModel.lmMergeBatch(ref, "doc_id", "text", table, s"$tmp/state", 0L)
      // reference grams: {a b, b c, c a}. Doc 9 "a b x c a": grams
      // (a b) seen, (b x) unseen, (x c) unseen, (c a) seen -> 2/4.
      val scored = LangModel.noveltyFromState(
          Seq((0L, "a b c a b"), (9L, "a b x c a"), (7L, "solo"))
            .toDF("doc_id", "text"), "doc_id", "text", table)
        .orderBy($"doc_id").collect()
      assert(scored.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq === Seq((0L, 4L, 0L), (7L, 0L, 0L), (9L, 4L, 2L)))
      assert(scored(0).getDouble(3) === 0.0)
      assert(scored(1).isNullAt(3), "a 1-word doc must score NULL, not NaN")
      assert(scored(2).getDouble(3) === 0.5)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("one full-text scan feeds the model; only doc_id rescans") {
    val docs = graft.Tables(spark, sf, "documents")
    val plan = LangModel.bigramPerplexity(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // scans: bigram explode (text), vocabulary count (text), base ids
    // (doc_id only) — the count tables and scoring join reuse the
    // checkpointed gram materialization instead of re-reading the corpus
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 3, s"expected <= 3 parquet scans, got $scans:\n$plan")
  }
}
