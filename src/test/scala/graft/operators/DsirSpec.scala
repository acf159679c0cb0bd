package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // two disjoint vocabularies: target-flavored docs speak "alpha",
  // off-target docs speak "beta"
  private val alphaDocs = Seq(
    (1L, "alpha wiki clean prose alpha wiki"),
    (2L, "clean prose alpha wiki clean"),
    (3L, "wiki prose clean alpha prose"))
  private val betaDocs = Seq(
    (11L, "beta spam noise beta spam"),
    (12L, "noise beta spam noise spam"),
    (13L, "spam noise beta beta noise"))

  private def weights(): Map[Long, (Long, Double)] = {
    import spark.implicits._
    val raw = (alphaDocs ++ betaDocs).toDF("doc_id", "text")
    val target = alphaDocs.map(_._2).toDF("text")
    Dsir.importanceWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
  }

  test("target-flavored documents carry higher importance weights than " +
      "off-target ones; gram counts are exact; the result is " +
      "layout-invariant at round-6") {
    import spark.implicits._
    val got = weights()
    val worstAlpha = alphaDocs.map(d => got(d._1)._2).min
    val bestBeta = betaDocs.map(d => got(d._1)._2).max
    assert(worstAlpha > bestBeta,
      s"alpha docs must outweigh beta docs, got $got")
    // n_grams = words + bigrams = 2·words − 1
    (alphaDocs ++ betaDocs).foreach { case (id, text) =>
      val w = text.split(" ").length
      assert(got(id)._1 === 2L * w - 1, s"doc $id")
    }
    // layout invariance under the round-6 release
    val raw = (alphaDocs ++ betaDocs).toDF("doc_id", "text").repartition(7)
    val target = alphaDocs.map(_._2).toDF("text")
    val re = Dsir.importanceWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(re === got)
  }

  test("a document duplicated INTO the target corpus gains weight " +
      "(the target distribution moved toward it)") {
    import spark.implicits._
    val raw = (alphaDocs ++ betaDocs).toDF("doc_id", "text")
    val base = Dsir.importanceWeights(raw, "doc_id", "text",
        alphaDocs.map(_._2).toDF("text"), "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val boosted = Dsir.importanceWeights(raw, "doc_id", "text",
        (alphaDocs.map(_._2) ++ Seq.fill(5)(betaDocs.head._2)).toDF("text"),
        "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(boosted(11L) > base(11L))
  }

  test("resample: Gumbel top-k is deterministic under a fixed seed, " +
      "ranks by the rounded key descending, overwhelming weights always " +
      "win, and k past the corpus returns everything") {
    import spark.implicits._
    val wts = Seq((1L, 1000.0), (2L, -1000.0), (3L, -1000.0),
      (4L, -1000.0), (5L, 999.0)).toDF("doc_id", "logw")
    val got = Dsir.resample(wts, "doc_id", "logw", k = 2, seed = "s-1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Gumbel noise spans ~[-3, 8] at 52-bit uniforms — a 1999-nat gap
    // cannot be crossed, so docs 1 and 5 are selected in weight order
    assert(got.map(_._2).toSeq === Seq(1L, 5L))
    assert(got(0)._3 > got(1)._3)
    val again = Dsir.resample(wts, "doc_id", "logw", k = 2, seed = "s-1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === again.toSeq, "fixed seed must replay bit-exact")
    val other = Dsir.resample(wts, "doc_id", "logw", k = 5, seed = "s-2")
      .collect()
    assert(other.length === 5, "k >= corpus size returns every doc")
  }

  test("maintained state ≡ one-shot bit-exactly across delta batches, " +
      "a target-less batch, and mid-stream compaction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val raw = (alphaDocs ++ betaDocs).toDF("doc_id", "text")
    val extra = Seq((21L, "late beta spam drivel")).toDF("doc_id", "text")
    val all = raw.union(extra)
    val target = alphaDocs.map(_._2).toDF("text")
    val oneShot = Dsir.importanceWeights(all, "doc_id", "text",
        target, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val salt = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val table = s"graft_dsir_spec_$salt"
    val tmp = java.nio.file.Files.createTempDirectory(s"dsir_$salt").toString
    try {
      // three id-mod batches carry their own target slice; batch 3 is a
      // late raw-only delta (no target arrived with it)
      for (i <- 0 until 3) {
        val slice = raw.filter(pmod($"doc_id", lit(3)) === i)
        val tgt = alphaDocs.filter(_._1 % 3 == i).map(_._2).toDF("text")
        Dsir.dsirMergeBatch(slice, "text",
          if (tgt.isEmpty) None else Some(tgt), "text",
          table, s"$tmp/state", i.toLong)
      }
      Dsir.dsirCompactState(spark, table, 1L)
      Dsir.dsirMergeBatch(extra, "text", None, "text",
        table, s"$tmp/state", 3L)
      val fromState = Dsir
        .dsirWeightsFromState(all, "doc_id", "text", table)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(fromState === oneShot)
      // slice scoring keeps the GLOBAL distributions: a beta doc scored
      // alone still carries its corpus-level weight
      val slice = Dsir.dsirWeightsFromState(
          all.filter($"doc_id" === 11L), "doc_id", "text", table)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(slice.toSeq === oneShot.filter(_._1 == 11L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("plan shapes: the bucket stats join BROADCASTS (scoring is one " +
      "gram scan, never a stats-side shuffle) and resample is " +
      "WINDOWLESS (bounded-heap aggregate, no global sort)") {
    import spark.implicits._
    val raw = (alphaDocs ++ betaDocs).toDF("doc_id", "text")
    val target = alphaDocs.map(_._2).toDF("text")
    val conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val wPlan = Dsir.importanceWeights(raw, "doc_id", "text",
          target, "text")
        .queryExecution.executedPlan.toString
      assert(wPlan.contains("BroadcastHashJoin"),
        s"expected the <= 4096-row stats table broadcast:\n$wPlan")
      val sPlan = Dsir.resample(
          Seq((1L, 0.5)).toDF("doc_id", "logw"), "doc_id", "logw",
          k = 3, seed = "s")
        .queryExecution.executedPlan.toString
      assert(!sPlan.contains("Window"), s"window in plan:\n$sPlan")
      assert(sPlan.contains("ObjectHashAggregate"),
        s"expected heap aggregate:\n$sPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
    }
  }
}
