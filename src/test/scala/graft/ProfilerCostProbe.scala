package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfilerCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables(spark, "/root/testdata/sf0.1", "lineitem")
      .localCheckpoint(true)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus", "l_shipdate")
    def time(tag: String)(body: => Unit): Unit = {
      body
      val t0 = System.nanoTime()
      body
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("full withExact") {
      graft.operators.Profiler.columnStats(li, cols, withExact = true)
        .write.format("noop").mode("overwrite").save()
    }
    time("full noExact") {
      graft.operators.Profiler.columnStats(li, cols, withExact = false)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
