package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures, per corpus scale, (a) the Hamming-distance distribution of the
  * TRUE J >= 0.8 near-dup pairs (what maxDistance must cover for full
  * recall) and (b) the pigeonhole candidate-pair volume at several piece
  * counts (what auto-banding must keep ~linear). Calibration data for
  * SimHash.autoParams — run: Test/runMain graft.SimHashProbe <sfDir>...
  */
object SimHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("simhash-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/root/repo/bench_scale/sf1")
    for (dir <- dirs) {
      val docs = Tables(spark, dir, "documents")
      val n = docs.count()
      // true pairs via the MinHash-banded path (recall-complete at these
      // scales per the gate) with distances attached
      val sh = docs.select($"doc_id",
          graft.operators.TextDedup.shingleHashSet($"text").as("sh"))
        .filter(size($"sh") > 0)
        .withColumn("fp", graft.operators.SimHash.simhash64($"sh"))
      val truePairs = graft.operators.TextDedup
        .nearDuplicates(docs, "doc_id", "text", threshold = 0.8)
        .join(sh.select($"doc_id".as("id_a"), $"fp".as("fa")), "id_a")
        .join(sh.select($"doc_id".as("id_b"), $"fp".as("fb")), "id_b")
        .select(graft.operators.SimHash.hamming($"fa", $"fb").as("d"))
        .groupBy($"d").count().orderBy($"d")
        .collect()
      val maxD = if (truePairs.isEmpty) -1 else truePairs.map(_.getInt(0)).max
      println(s"== $dir  n=$n  truePairDistances=${truePairs.map(r =>
        s"${r.getInt(0)}:${r.getLong(1)}").mkString(",")}  maxD=$maxD")
      // candidate volume per piece count (pre-verification join size).
      // Skip piece counts whose EXPECTED volume (the autoParams model)
      // exceeds ~1e9 pairs — at 500k docs p>=7 predicts 1.5e9..10^10
      // candidates, which is exactly what the ladder exists to avoid;
      // override with SIMHASH_PIECES=csv.
      val pieceList = sys.env.get("SIMHASH_PIECES")
        .map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(13, 11, 9, 8, 7, 6, 5).filter(p =>
          p * n.toDouble * n.toDouble / math.pow(2.0, 64.0 / p + 1.0) <= 1e9))
      for (p <- pieceList) {
        val t0 = System.nanoTime()
        val cand = graft.operators.SimHash
          .nearDuplicates(docs, "doc_id", "text",
            maxDistance = p - 1, pieces = p)
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"   pieces=$p%2d maxD=${p - 1}%2d pairs<=maxD=$cand%8d  ${sec}%.2f s")
      }
    }
    spark.stop()
  }
}
