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
