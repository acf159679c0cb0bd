package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = graft.Tables(spark, "/root/testdata/sf0.01", "embeddings")

  test("codes stay in [0,255]; dequantized error bounded by half a step") {
    import spark.implicits._
    val (lo, hi) = Quantize.dimStats(emb, "embedding")
    assert(lo.length == 64 && hi.length == 64)
    assert(lo.zip(hi).forall { case (l, h) => l <= h })
    val checked = emb.select($"vec_id", $"embedding",
      Quantize.codes($"embedding", lo, hi).as("q"))
      .select($"vec_id", $"embedding", $"q",
        Quantize.dequantize($"q", lo, hi).as("dv"))
    val bad = checked.select(
      array_max($"q").as("qmax"), array_min($"q").as("qmin"),
      aggregate(zip_with($"embedding".cast("array<double>"), $"dv",
        (a, b) => abs(a - b)), lit(0.0), (acc, x) => greatest(acc, x)).as("maxerr"))
    val steps = lo.zip(hi).map { case (l, h) => (h - l) / 255.0 }.max
    val rows = bad.collect()
    assert(rows.forall(r => r.getInt(0) <= 255 && r.getInt(1) >= 0))
    assert(rows.forall(_.getDouble(2) <= steps / 2 + 1e-9),
      s"reconstruction error exceeds half a quantization step")
  }

  test("quantized top-k closely tracks the exact top-k") {
    val exact = graft.queries.Corpus.queries("knn_cosine_topk")(spark,
      "/root/testdata/sf0.01").collect().map(_.getLong(0)).toSet
    val quant = graft.SparkEntry.queries("emb_quantize_int8")(spark,
      "/root/testdata/sf0.01").collect().map(_.getLong(0)).toSet
    assert((exact & quant).size >= 8, s"int8 recall too low: ${(exact & quant).size}/10")
  }
}
