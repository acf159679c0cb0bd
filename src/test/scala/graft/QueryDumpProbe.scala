package graft

import org.apache.spark.sql.SparkSession

/** Scale-robustness probe: dump a SUBSET of SparkEntry.queries at an
  * arbitrary sf dir (usage: QueryDumpProbe <sfDir> <outDir> <query>...),
  * for comparing against the DuckDB oracles at scale factors the driver's
  * sf0.01 gate doesn't cover. Complements Verify (which always runs the
  * full set).
  */
object QueryDumpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[dump] $name done")
    }
    spark.stop()
  }
}
