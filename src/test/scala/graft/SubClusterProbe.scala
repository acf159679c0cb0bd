package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures substringClusters (the linear-output substring-dedup path) per
  * corpus scale with the AUTO dfCap — the operator that must survive the
  * mega-cluster regime where substringOverlap's pair output is Θ(c²)
  * (DfCapProbe measured OOM/8.5M-pair blowups at the 100× sweep corpus).
  * Run: Test/runMain graft.SubClusterProbe [dirs...]
  */
object SubClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("subcluster-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/root/repo/bench_scale/sf1", "/root/repo/bench_scale/sf10")
    for (dir <- dirs) {
      val docs = Tables(spark, dir, "documents")
      val n = docs.count()
      val t0 = System.nanoTime()
      val cl = graft.operators.TextDedup
        .substringClusters(docs, "doc_id", "text", nHint = n)
        .localCheckpoint(true)
      val members = cl.count()
      val stats = cl.groupBy($"cluster_id").count()
        .agg(count(lit(1)).as("clusters"),
          coalesce(max($"count"), lit(0L)).as("maxsz"))
        .head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== $dir n=$n members=$members clusters=${stats.getLong(0)} " +
        f"maxsize=${stats.getLong(1)} ${sec}%.1f s (autoDfCap=" +
        f"${graft.operators.TextDedup.autoDfCap(n)})")
    }
    spark.stop()
  }
}
