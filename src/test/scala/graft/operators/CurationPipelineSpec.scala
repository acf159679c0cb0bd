package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Capstone integration: the full corpus → training-shards path, composing
  * the independently-gated operators the way a real pipeline would —
  * quality filter (length / repetition / LM perplexity), near-dup removal
  * (keep the lower id of every verified pair), token-budget packing, and a
  * bin-partitioned shard write. Asserts set-level invariants end to end:
  * every surviving doc lands in exactly one shard, no shard crosses the
  * token budget by more than one document, and no near-dup pair survives.
  */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("corpus to shards: filter, dedup, pack, partitioned write") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")

    // 1. quality verdicts from the gated signal operators
    val signals = docs
      .select($"doc_id", size(split($"text", " ", -1)).cast("bigint").as("n_tokens"))
      .join(Curation.topGramCoverage(docs, "doc_id", "text", n = 2), Seq("doc_id"))
      .join(LangModel.bigramPerplexity(docs, "doc_id", "text")
        .select($"doc_id", $"ppl"), Seq("doc_id"))
    val kept = signals
      .filter($"n_tokens" >= 15 && $"top_frac" <= 0.12 && $"ppl" <= 33.0)
      .select($"doc_id", $"n_tokens")

    // 2. near-dup removal: drop the HIGHER id of every verified pair
    // (computed once; the invariant check below reuses the collected set)
    val pairs = TextDedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dupIds = pairs.map(_._2).distinct.toSeq.toDF("doc_id")
    val surviving = kept.join(dupIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    // 3. pack into 500-token bins and write one shard dir per bin
    val binned = Pack.packBins(surviving, "doc_id", "n_tokens",
      budget = 500L, bucketSpan = 16L)
    val outDir = java.nio.file.Files.createTempDirectory("shards").toString + "/out"
    binned.write.partitionBy("bin").parquet(outDir)

    // invariants
    val written = spark.read.parquet(outDir)
    val survivors = surviving.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(written.count() == survivors.size, "every survivor lands in a shard")
    assert(written.select($"doc_id").distinct().count() == survivors.size,
      "exactly once")
    // no near-dup pair survives
    val survivorSet = survivors.keySet
    assert(!pairs.exists(p => survivorSet(p._1) && survivorSet(p._2)))
    // bins respect the budget up to the one straddling doc the prefix-sum
    // layout allows (a doc starts in the bin its running offset falls in)
    val binTotals = written.groupBy($"bin")
      .agg(sum($"n_tokens").as("t"), max($"n_tokens").as("mx"))
      .collect()
    binTotals.foreach { r =>
      assert(r.getLong(1) < 500L + r.getLong(2),
        s"bin ${r.get(0)} holds ${r.getLong(1)} tokens (max doc ${r.getLong(2)})")
    }
    // some filtering and some packing actually happened
    assert(survivors.size < docs.count() && binTotals.length > 1)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
  }
}
