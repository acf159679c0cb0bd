package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only scale-up generator (round 6): materializes an N× copy of an
  * sf dir's documents/embeddings/events tables for the scale sweep —
  * NOT correctness data (the driver's oracle gate stays on the driver-
  * generated sf dirs; this exists to measure that per-query time scales
  * ~linearly where the plans claim it should).
  *
  * Each copy is made DISJOINT from the others so the workload keeps the
  * source distribution instead of planting cross-copy duplicate clusters:
  *  - documents: every word gets a per-copy suffix → zero cross-copy
  *    shingle overlap; each copy contributes its own planted near-dup
  *    pairs, so pair counts scale ×N, not ×N².
  *  - embeddings: ids offset; one dimension nudged by a per-copy epsilon
  *    (cross-copy cosines shift off the planted-duplicate thresholds).
  *  - events: user ids offset per copy → per-user session/as-of structure
  *    preserved, key cardinality ×N.
  *
  * Usage: ScaleDataGen <srcSfDir> <outDir> <copies>
  */
object ScaleDataGen {
  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesS) = args.take(3)
    val copies = copiesS.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def union(mk: Int => DataFrame): DataFrame =
      (0 until copies).map(mk).reduce(_ unionByName _)
    // id offsets stay DENSE (stride = max id + 1): PQ's strided codebook
    // init validates dense 0-based vec_ids, and dense ids keep id-derived
    // structure (mod-block tiling, stratified md5 keys) distribution-true
    def stride(df: DataFrame, idCol: String): Long =
      df.agg(max(col(idCol))).head.getLong(0) + 1L

    val docs = Tables(spark, src, "documents")
    val docStride = stride(docs, "doc_id")
    union { c =>
      docs.select(
        (col("doc_id") + lit(c * docStride)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " ", -1),
          w => concat(w, lit(s"_$c")))).as("text"),
        col("lang"), col("source"))
    }.withColumn("n_chars", length(col("text")).cast("bigint"))
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables(spark, src, "embeddings")
    val embStride = stride(emb, "vec_id")
    union { c =>
      emb.select(
        (col("vec_id") + lit(c * embStride)).as("vec_id"),
        transform(col("embedding"),
          (v, i) => when(i === 0, v + lit(c * 1e-3f)).otherwise(v))
          .as("embedding"),
        col("label"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev = Tables(spark, src, "events")
    val evStride = stride(ev, "event_id")
    val userStride = stride(ev, "user_id")
    union { c =>
      ev.select(
        (col("event_id") + lit(c * evStride)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(c * userStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    println(s"[scale] wrote ${copies}x of $src to $out")
    spark.stop()
  }
}
