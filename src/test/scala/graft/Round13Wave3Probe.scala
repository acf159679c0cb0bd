package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-13 wave-3 operators (truncated EWMA,
  * deterministic corpus shuffle): disjoint shifted-id copies. Claimed
  * shapes under test:
  *
  *  - Robust.ewmaSmoothed: ONE window pass (one key shuffle + an
  *    in-partition sort), L lag columns of codegen arithmetic — linear
  *    in rows, key count irrelevant;
  *  - Curation.shuffleShards: one md5 per row + one hash exchange on
  *    the shard key + an in-partition sort — linear, shard sizes
  *    uniform by construction.
  *
  * Usage: Round13Wave3Probe <sfDir> [mult]   (default mult = 10)
  */
object Round13Wave3Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // EWMA over per-(type-copy, day) counts: copies multiply the KEY
    // space; per-key series length stays the fixture's day span
    def daily(m: Int) = (0 until m).map { i =>
      Tables(spark, dir, "events")
        .groupBy(concat($"event_type", lit(s"#$i")).as("event_type"),
          to_date($"ts").as("d"))
        .agg(count(lit(1)).as("n_events"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    // and over per-(user-copy) event series: row-scale growth
    def byUser(m: Int) = (0 until m).map { i =>
      Tables(spark, dir, "events")
        .select(($"user_id" + lit(i.toLong * 1000000000L)).as("u"),
          $"ts", $"event_id", $"value")
    }.reduce(_ unionByName _).localCheckpoint(true)
    for (m <- Seq(1, mult)) {
      val d = daily(m)
      println(s"[probe] ewma daily keys x$m: rows=${d.count()}")
      timed(s"ewmaSmoothed daily x$m") {
        println(s"[probe]   rows=${graft.operators.Robust
          .ewmaSmoothed(d, Seq("event_type"), "d", "n_events").count()}")
      }
      val u = byUser(m)
      println(s"[probe] ewma user series x$m: rows=${u.count()}")
      timed(s"ewmaSmoothed per-user x$m") {
        println(s"[probe]   rows=${graft.operators.Robust
          .ewmaSmoothed(u, Seq("u"), "ts", "value").count()}")
      }
    }

    def corpus(m: Int) = (0 until m).map { i =>
      Tables(spark, dir, "documents")
        .select(($"doc_id" + lit(i.toLong * 1000000000L)).as("doc_id"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    for (m <- Seq(1, mult)) {
      val docs = corpus(m)
      println(s"[probe] shuffle corpus x$m: docs=${docs.count()}")
      timed(s"shuffleShards x$m") {
        println(s"[probe]   rows=${graft.operators.Curation
          .shuffleShards(docs, "doc_id", numShards = 16).count()}")
      }
    }
    spark.stop()
  }
}
