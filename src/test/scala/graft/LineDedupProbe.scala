package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for `Curation.autoMinDf` calibration (round 9):
  * runs `lineDedup` over gate-shaped lines (12-word paragraphs wrapped in
  * per-source header/footer, the doc_line_dedup construction) at fixed
  * minDf=2 vs autoMinDf(n), reporting lines removed, headers removed and
  * wall time. Usage: LineDedupProbe <sfDir>
  */
object LineDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val d = Tables(spark, dir, "documents")
      .select($"doc_id", $"source", split($"text", " ", -1).as("w"))
    val paras = transform(
      sequence(lit(0), ((size($"w") + lit(11)) / lit(12)).cast("int") - 1),
      i => array_join(slice($"w", i * 12 + 1, lit(12)), " "))
    val hdr = array(concat(lit("== "), $"source", lit(" ==")))
    val lined = d.select($"doc_id",
      array_join(flatten(array(hdr, paras, hdr)), "\n").as("txt"))
      .localCheckpoint(true)
    val n = lined.count()
    val auto = graft.operators.Curation.autoMinDf(n)
    println(s"n=$n autoMinDf=$auto")

    for ((tag, df) <- Seq("fixed2" -> 2, s"auto$auto" -> auto)) {
      val t0 = System.nanoTime()
      val out = graft.operators.Curation
        .lineDedup(lined, "doc_id", "txt", delim = "\n", minDf = df)
        .agg(sum($"n_removed").as("removed"), sum($"n_kept").as("kept"))
        .head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$tag: removed=${out.getLong(0)} kept=${out.getLong(1)} wall=$secs%.1f s")
    }
    // headers have df ~ n/#sources — they must die at BOTH thresholds
    val hdrDf = lined
      .select(explode(split($"txt", "\n", -1)).as("line"))
      .filter($"line".startsWith("== "))
      .groupBy($"line").agg(countDistinct($"line").as("x"), count(lit(1)).as("cnt"))
      .agg(min($"cnt")).head().getLong(0)
    println(s"min header line occurrences (>= df): $hdrDf")
    spark.stop()
  }
}
