package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CorpusSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Interpreted reference for the shingle expression: split on single
    * space KEEPING empty tokens, md5 each word 3-gram, distinct in
    * first-occurrence order.
    */
  private def refShingles(text: String, n: Int): Seq[String] = {
    val w = text.split(" ", -1)
    if (w.length < n) Seq.empty
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 to w.length - n).map { i =>
        val d = md.digest(w.slice(i, i + n).mkString(" ")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.reset()
        d.map(b => f"$b%02x").mkString
      }.distinct
    }
  }

  test("ShingleMd5Expr matches the interpreted reference incl. degenerate inputs") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps",
      "a b c",
      "a b",                 // too short
      "",                    // empty
      "a  b c d",            // consecutive spaces -> empty token kept
      " leading space x y",
      "trailing space x y ",
      "unicode 一 二 三 four",
      "dup dup dup dup dup") // repeated shingles collapse
    val got = texts.toDF("text")
      .select($"text",
        graft.functions.ShingleMd5Expr.shingleMd5($"text", 3).as("sh"))
      .collect()
    got.foreach { r =>
      val t = r.getString(0)
      assert(r.getSeq[String](1) == refShingles(t, 3), s"text='$t'")
    }
  }

  test("estimated corpus Jaccard lands within the binomial band of the true value") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // vocabulary of unique words; sentences of 10 words. Corpus A and B
    // share `shared` sentences and own `solo` each -> true shingle
    // Jaccard ~= shared / (shared + 2*solo) (sentences are word-disjoint,
    // so shingle sets are sentence-disjoint unions)
    def sentence(tag: String, i: Int) =
      (0 until 10).map(j => s"w${tag}_${i}_$j").mkString(" ")
    val shared = (1 to 400).map(i => sentence("s", i))
    val soloA = (1 to 300).map(i => sentence("a", i))
    val soloB = (1 to 300).map(i => sentence("b", i))
    val docs = (shared ++ soloA).map(("A", _)) ++ (shared ++ soloB).map(("B", _))
    val df = rnd.shuffle(docs).toDF("corpus", "text")
    val est = CorpusSketch.estimateJaccard(df, "corpus", "text")
      .collect().head
    // per-sentence shingles: 8 each, all distinct across sentences
    val inter = 400.0 * 8
    val union = (400.0 + 300 + 300) * 8
    val trueJ = inter / union
    val sd = math.sqrt(trueJ * (1 - trueJ) / 256)
    assert(math.abs(est.getAs[Double]("est_jaccard") - trueJ) < 4 * sd,
      s"est=${est.getAs[Double]("est_jaccard")} true=$trueJ sd=$sd")
    assert(est.getAs[Long]("slots_both") == 256L, "dense corpora fill all slots")
  }

  test("merged shard signatures equal the one-shot signature exactly") {
    import spark.implicits._
    val docs = (1 to 500).map { i =>
      (if (i % 2 == 0) "A" else "B",
        (0 until 12).map(j => s"t${i % 7}_${i}_$j").mkString(" "))
    }
    val df = docs.toDF("corpus", "text")
    val shards = Seq(df.filter(length($"text") % 3 === 0),
      df.filter(length($"text") % 3 === 1),
      df.filter(length($"text") % 3 === 2))
      .map(d => CorpusSketch.signature(d, "corpus", "text"))
    val merged = CorpusSketch.mergeSignatures(
      shards.reduce(_ unionByName _), "corpus")
      .orderBy($"corpus", $"slot")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val oneShot = CorpusSketch.signature(df, "corpus", "text")
      .orderBy($"corpus", $"slot")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(merged.toSeq == oneShot.toSeq)
  }

  test("identical corpora estimate Jaccard 1; disjoint corpora estimate 0") {
    import spark.implicits._
    val base = (1 to 100).map(i => (0 until 8).map(j => s"c${i}_$j").mkString(" "))
    val disjoint = (1 to 100).map(i => (0 until 8).map(j => s"d${i}_$j").mkString(" "))
    val df = (base.map(("X", _)) ++ base.map(("Y", _)) ++ disjoint.map(("Z", _)))
      .toDF("corpus", "text")
    val est = CorpusSketch.estimateJaccard(df, "corpus", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("est_jaccard")).toMap
    assert(est(("X", "Y")) == 1.0)
    assert(est(("X", "Z")) == 0.0)
    assert(est(("Y", "Z")) == 0.0)
  }

  test("signature maintained per batch equals one-shot; min-merge shrugs off replays and crash windows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("corpus_sig").toString
    val table = "graft_corpus_sig_stream"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      def mk(tag: String, lo: Int, hi: Int) =
        (lo until hi).map(i => (tag, (0 until 10).map(j => s"v${tag}_${i}_$j").mkString(" ")))
      val b0 = (mk("A", 0, 200) ++ mk("B", 0, 100)).toDF("corpus", "text")
      val b1 = (mk("A", 150, 350) ++ mk("B", 80, 220)).toDF("corpus", "text")
      CorpusSketch.mergeBatch(b0, "corpus", "text", table, s"$tmp/sig", batchId = 0L)
      CorpusSketch.mergeBatch(b1, "corpus", "text", table, s"$tmp/sig", batchId = 1L)

      def fromTable() = CorpusSketch.signatureFromTable(spark, table, "corpus")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
      val oneShot = CorpusSketch.signature(b0.unionByName(b1), "corpus", "text")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
      assert(fromTable() == oneShot)

      // replay batch 1: min is idempotent, but contents must also be
      // exactly-once (dynamic overwrite of the batch's own partition)
      CorpusSketch.mergeBatch(b1, "corpus", "text", table, s"$tmp/sig", batchId = 1L)
      assert(fromTable() == oneShot)

      CorpusSketch.compactSignature(spark, table, upToBatchId = 1L)
      assert(spark.table(table).select($"_batch_id").distinct()
        .collect().map(_.getLong(0)).toSet == Set(-2L))
      assert(fromTable() == oneShot)

      // crash-window idempotence (the min-merge contract): a leftover
      // duplicate source partition cannot perturb the merged signature
      CorpusSketch.mergeBatch(b0, "corpus", "text", table, s"$tmp/sig", batchId = 0L)
      assert(fromTable() == oneShot)
      assert(spark.table(table).count() <= 2L * 2L * 256L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}
