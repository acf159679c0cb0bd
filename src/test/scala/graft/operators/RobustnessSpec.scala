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

  test("empty input frames produce empty outputs everywhere") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.nearDuplicates(empty, "doc_id", "text").count() == 0)
    assert(Curation.chunkDocs(empty, "doc_id", "text", 5, 3).count() == 0)
    assert(LangModel.bigramPerplexity(empty, "doc_id", "text").count() == 0)
    assert(TextAnalysis.tfidfTopK(empty, "doc_id", "text").count() == 0)
    assert(Curation.repetitionStats(empty, "doc_id", "text").count() == 0)
  }
}
