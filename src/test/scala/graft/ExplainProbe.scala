package graft
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      // count scans + exchanges + BNLJ
      println("scans of documents/embeddings/events: " +
        "documents=" + "documents".r.findAllIn(plan).count(_ => true))
      println("exchanges: " + "Exchange".r.findAllIn(plan).size)
      println("BNLJ: " + plan.contains("BroadcastNestedLoopJoin"))
      println("CartesianProduct: " + plan.contains("CartesianProduct"))
      df.explain("formatted")
    }
    spark.stop()
  }
}
