package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for doc_dedup_jaccard at sf0.1 (not a test). */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.1", "documents")
    def time(label: String)(f: => Long): Unit = {
      f; val t0 = System.nanoTime(); val n = f
      println(f"$label%-42s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val sh = docs.select($"doc_id", TextDedup.shingleHashSet($"text", 3).as("sh"))
      .filter(size($"sh") > 0).withColumn("sz", size($"sh"))
    time("sh (hash sets)")(sh.count())
    val prefLen = ($"sz" - ceil($"sz" * 0.8) + 1).cast("int")
    val noCap = sh.select($"doc_id", $"sz",
      explode(slice(sort_array($"sh"), lit(1), prefLen)).as("h"))
    time("prefix index no df-cap")(noCap.count())
    val inv = noCap.withColumn("_df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter($"_df" <= 1000).drop("_df")
    time("prefix index with df-cap window")(inv.count())
    val cand = inv.select($"h", $"doc_id".as("id_a"), $"sz".as("sz_a"))
      .join(inv.select($"h", $"doc_id".as("id_b"), $"sz".as("sz_b")), Seq("h"))
      .filter($"id_a" < $"id_b" &&
        least($"sz_a", $"sz_b") >= ceil(greatest($"sz_a", $"sz_b") * 0.8))
      .select("id_a", "id_b").distinct()
    time("candidates")(cand.count())
    time("full")(TextDedup.jaccardNearDuplicates(docs, "doc_id", "text", 0.8).count())
    val fullPlan = TextDedup.jaccardNearDuplicates(docs, "doc_id", "text", 0.8).queryExecution.executedPlan.toString
    println("ReusedExchange nodes: " + "ReusedExchange".r.findAllIn(fullPlan).size)
    println("Exchange nodes: " + "Exchange hash".r.findAllIn(fullPlan).size)
    println("BroadcastExchange nodes: " + "BroadcastExchange".r.findAllIn(fullPlan).size)
    println("Window nodes: " + "Window".r.findAllIn(fullPlan).size)
    spark.stop()
  }
}
