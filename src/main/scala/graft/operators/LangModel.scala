package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring — the model-based filter of
  * the CCNet/KenLM family (Wenzek et al. 2020 filter CommonCrawl by LM
  * perplexity; Gopher and Llama keep the same signal): train an add-one
  * smoothed word-BIGRAM model on the corpus itself, then score every
  * document by its cross-entropy under that model. Documents far from the
  * corpus distribution (spam, gibberish, boilerplate) score high.
  *
  *   P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
  *
  * with c(w1 w2) the corpus bigram occurrence count, c(w1 ·) the count of
  * w1 as a bigram prefix (so the conditional sums to 1 over the closed
  * vocabulary) and V the corpus unigram vocabulary size.
  *
  * Scale shape: ONE text scan explodes bigrams into per-doc (gram,
  * multiplicity) rows — partial-aggregated map-side, then checkpointed so
  * the three consumers (global bigram counts, prefix counts, per-doc
  * scoring) share the materialization instead of re-reading the corpus.
  * The bigram-count join is equality-keyed on the gram (Zipf-hot grams are
  * single-row on the count side — AQE skew split handles the fan-in); the
  * prefix-count and vocabulary tables are vocabulary-sized, orders of
  * magnitude below the corpus, and broadcast. The only other corpus scan
  * is the one-column vocabulary count (map-side partial count-distinct).
  * No driver loop, no UDF: `ln` and the weighted sums are codegen.
  */
object LangModel {

  /** Per-document bigram cross-entropy and perplexity under the corpus
    * add-one bigram model: (doc_id, n_bigrams, ce, ppl), `ce` in nats,
    * `ppl = exp(ce)`, both rounded to 4 decimals (the sums are
    * order-unstable in the last ulp; 4 decimals is ~1e9 ulps of margin).
    * Documents with fewer than two words score ce = ppl = 0.
    */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(col(textCol), " ", -1)
    val grams = docs
      .select(col(idCol).as("doc_id"),
        explode(Curation.wordGrams(w, 2)).as("gram"))
      .select(col("doc_id"), col("gram"),
        substring_index(col("gram"), " ", 1).as("w1"))
      .groupBy(col("doc_id"), col("gram"), col("w1"))
      .agg(count(lit(1)).cast("double").as("m"))
      .localCheckpoint(true)
    val bigramCounts = grams.groupBy(col("gram")).agg(sum(col("m")).as("c2"))
    val prefixCounts = grams.groupBy(col("w1")).agg(sum(col("m")).as("c1"))
    val vocab = docs
      .select(explode(split(col(textCol), " ", -1)).as("word"))
      .agg(countDistinct(col("word")).cast("double").as("vocab"))
    val scored = grams
      .join(bigramCounts, Seq("gram"))
      .join(broadcast(prefixCounts), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("m") * log((col("c2") + 1.0) / (col("c1") + col("vocab"))))
          .as("logp"),
        sum(col("m")).cast("bigint").as("n_bigrams"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(round(-col("logp") / col("n_bigrams"), 4), lit(0.0)).as("ce"),
        coalesce(round(exp(-col("logp") / col("n_bigrams")), 4), lit(0.0))
          .as("ppl"))
  }
}
