package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement probe: time allPairsCosine top-10 at different tile
  * counts (usage: TileProbe <sfDir> <blocks>...) — median of 3 after warmup,
  * noop sink, same methodology as Bench.
  */
object TileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val blockCounts = args.drop(1).map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def base(b: Int) = graft.operators.SimilarityJoin
      .allPairsCosine(Tables(spark, sfDir, "embeddings"), "vec_id", "embedding", blocks = b)
    def qRounded(b: Int) = base(b)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      .limit(10)
    def qRaw(b: Int) = base(b)
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      .limit(10)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
    def qNoSort(b: Int) = base(b)
      .filter(col("sim") >= 0.45)
    val variants = Seq("rounded" -> (qRounded _), "rawsort" -> (qRaw _),
      "nosort" -> (qNoSort _))
    blockCounts.foreach { b =>
      variants.foreach { case (name, mk) =>
        def once(): Double = {
          val t0 = System.nanoTime()
          mk(b).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once()
        val ts = Seq.fill(3)(once()).sorted
        println(f"[tile] blocks=$b%3d $name%8s median=${ts(1)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
