package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line for the driver's BENCH_r{N}.json.
  *
  * Methodology: per query, one warmup execution (absorbs codegen, parquet
  * footer reads and JIT), then 3 timed executions writing every output
  * column to the `noop` sink (so column pruning cannot skip real expression
  * work the way `.count()` does); the reported number is the median.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // optional comma-separated subset (re-measurement / scale sweeps);
    // unset = the driver's full run
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names no such query: ${unknown.mkString(", ")}")
    }
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)

    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = try {
        runOnce(fn) // warmup
        val times = Seq.fill(3)(runOnce(fn)).sorted
        times(1) // median
      } catch { case _: Throwable => -1.0 }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
