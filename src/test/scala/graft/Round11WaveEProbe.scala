package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-11 wave-E/F operators (embedding drift,
  * as-of tolerance, pseudonymization): disjoint shifted-id copies.
  * Claimed shapes:
  *
  *  - Drift.embeddingDrift: one posexplode scan per side to
  *    groups×dims BIGINT sums (map-side combined), then sketch-sized
  *    join + agg — scan-bound, statistics frames data-size-independent;
  *  - Temporal.asofJoinBackwardTolerance: identical plan to the plain
  *    as-of (the bound is a scan-side when) — measures the delta ≈ 0;
  *  - Privacy.pseudonymize: scan-side md5 projection, zero shuffle.
  *
  * Usage: Round11WaveEProbe <sfDir> [mult]   (default mult = 10)
  */
object Round11WaveEProbe {
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

    val emb0 = Tables(spark, dir, "embeddings")
    val emb = (0 until mult).map { i =>
      emb0.select(($"vec_id" + lit(i.toLong * 10000000L)).as("vec_id"),
        $"embedding", $"label")
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] embeddings x$mult: ${emb.count()}")
    timed(s"embeddingDrift per label x$mult") {
      val half = substring(
        md5(concat(lit("edrift:"), $"vec_id".cast("string"))), 1, 1) < "8"
      println(s"[probe]   groups=${graft.operators.Drift.embeddingDrift(
        emb.filter(half), emb.filter(!half), Seq("label"), "embedding")
        .count()}")
    }

    val ev0 = Tables(spark, dir, "events")
    val ev = (0 until mult).map { i =>
      ev0.select(($"event_id" + lit(i.toLong * 1000000000L)).as("event_id"),
        ($"user_id" + lit(i.toLong * 10000000L)).as("user_id"),
        $"ts", $"event_type", $"value")
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] events x$mult: ${ev.count()}")
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val c = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("event_id"))
      .select($"event_id", $"user_id", $"ts")
    timed(s"asofJoinBackward plain x$mult") {
      println(s"[probe]   rows=${graft.operators.Temporal.asofJoinBackward(
        p, c, "user_id", "ts", "ts", "event_id").count()}")
    }
    timed(s"asofJoinBackwardTolerance x$mult") {
      println(s"[probe]   rows=${graft.operators.Temporal
        .asofJoinBackwardTolerance(p, c, "user_id", "ts", "ts", "event_id",
          toleranceUs = 900000000L).count()}")
    }

    timed(s"pseudonymize 2 cols x$mult") {
      println(s"[probe]   rows=${graft.operators.Privacy.pseudonymize(
        ev, Seq("event_type", "value"), "probe-salt").count()}")
    }

    timed(s"cusumShift over daily pre-agg x$mult") {
      val daily = ev.groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).as("n_events"))
      println(s"[probe]   rows=${graft.operators.Robust.cusumShift(daily,
        Seq("event_type"), "d", "n_events", 2L, 20L).count()}")
    }

    spark.stop()
  }
}
