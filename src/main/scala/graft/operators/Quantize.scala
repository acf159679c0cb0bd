package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding columns — the standard 4×
  * memory/bandwidth reduction an ANN or training-data pipeline applies
  * before indexing (per-dimension affine quantization, the FAISS
  * `SQ8`-style codec).
  *
  * Per-dimension `lo`/`hi` come from ONE distributed pass (posexplode +
  * per-dim min/max — dim-sized result, broadcast back as literals);
  * quantization/dequantization are then pure per-row column expressions.
  * `floor(x + 0.5)` rather than `round()` on both engines: round-half
  * semantics differ between Spark (HALF_UP on decimals) and DuckDB, while
  * floor(+0.5) is bit-identical.
  *
  * The transforms use `transform(...)` higher-order functions: interpreted,
  * but a single linear scan per row, never re-evaluated across join
  * branches (the round-3 HOF trap) — a codegen QuantizeExpr is the upgrade
  * path if this ever sits in a hot loop.
  */
object Quantize {

  /** (lo, hi) per dimension over the corpus: one aggregation pass. */
  def dimStats(embeddings: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val rows = embeddings
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x").cast("double")).as("lo"), max(col("x").cast("double")).as("hi"))
      .orderBy(col("pos"))
      .collect()
    (rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  private def at(xs: Seq[Double], i: Column): Column =
    element_at(typedLit(xs), (i + 1).cast("int"))

  /** Quantized codes: array<int> in [0, 255] per dimension. */
  def codes(vec: Column, lo: Seq[Double], hi: Seq[Double]): Column =
    transform(vec, (x, i) => {
      val l = at(lo, i)
      val h = at(hi, i)
      val scale = (h - l) / 255.0
      when(h === l, lit(0))
        .otherwise(least(greatest(
          floor((x.cast("double") - l) / scale + 0.5), lit(0.0)), lit(255.0))
          .cast("int"))
    })

  /** Dequantized vector: lo + code * scale per dimension (array<double>). */
  def dequantize(codes: Column, lo: Seq[Double], hi: Seq[Double]): Column =
    transform(codes, (q, i) => {
      val l = at(lo, i)
      val h = at(hi, i)
      when(h === l, l).otherwise(l + q.cast("double") * ((h - l) / 255.0))
    })
}
