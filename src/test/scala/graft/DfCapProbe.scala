package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures substringOverlap recall vs dfCap at each corpus scale, plus the
  * winnowing-fingerprint df distribution — calibration for the auto dfCap.
  * Run: Test/runMain graft.DfCapProbe
  */
object DfCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("dfcap-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/root/repo/bench_scale/sf1")
    val caps = sys.env.get("DFCAP_CAPS")
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(4, 16, 32, 64, 128))
    for (dir <- dirs) {
      val docs = Tables(spark, dir, "documents")
      val n = docs.count()
      val fp = docs.select($"doc_id",
        explode(graft.operators.TextAnalysis.winnowingFingerprint($"text", 8, 4)).as("f"))
      val dfh = fp.groupBy($"f").agg(count(lit(1)).as("df"))
        .groupBy(
          when($"df" <= 1, "1").when($"df" <= 4, "2-4")
            .when($"df" <= 16, "5-16").when($"df" <= 64, "17-64")
            .when($"df" <= 256, "65-256").otherwise(">256").as("df_bin"))
        .agg(count(lit(1)).as("n_fps")).orderBy($"df_bin")
        .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(" ")
      println(s"== $dir n=$n  dfHist[$dfh]")
      for (cap <- caps) {
        val t0 = System.nanoTime()
        val pairs = graft.operators.TextDedup
          .substringOverlap(docs, "doc_id", "text", dfCap = cap).count()
        println(f"   cap=$cap%4d pairs=$pairs%8d  ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
