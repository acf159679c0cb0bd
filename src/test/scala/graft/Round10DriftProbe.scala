package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-10 third-wave operators (distribution
  * drift, KMV A-not-B, hopping windows): times each on the sf dir's
  * events replicated `mult`× with shifted ids (disjoint copies — the
  * ScaleDataGen discipline, so cardinalities scale with data). Evidence
  * the claimed shapes hold at 10×/100×: drift is two map-combined
  * histogram scans + sketch-sized statistics, A-not-B is sketch-build
  * bound, hopping is one fan-out scan + one shuffle.
  *
  * Usage: Round10DriftProbe <sfDir> [mult]   (default mult = 10)
  */
object Round10DriftProbe {
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

    val ev0 = Tables(spark, dir, "events")
    val ev = (0 until mult).map { i =>
      ev0.select(($"event_id" + lit(i.toLong * 1000000000L)).as("event_id"),
        $"ts", ($"user_id" + lit(i.toLong * 1000000L)).as("user_id"),
        $"event_type", $"value", $"props")
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] events x$mult: ${ev.count()} rows")

    val vv = ev.filter($"value".isNotNull)
      .withColumn("v", floor($"value" * 100).cast("long")).filter($"v" >= 1)
    val mid = lit("2024-01-16 00:00:00").cast("timestamp")

    timed(s"Drift.histogramDrift x$mult") {
      val r = graft.operators.Drift.histogramDrift(
          vv.filter($"ts" < mid), vv.filter($"ts" >= mid),
          Seq("event_type"), "v")
        .orderBy($"event_type").collect()
      println(s"[probe]   groups=${r.length} " +
        f"ks0=${r.head.getAs[Double]("ks")}%.6f")
    }

    timed(s"Temporal.hoppingAggregate x$mult") {
      val n = graft.operators.Temporal.hoppingAggregate(
          ev.withColumn("cents", floor($"value" * 100).cast("long")),
          "event_type", "ts", $"cents", "1 hour", "15 minutes")
        .count()
      println(s"[probe]   windows=$n")
    }

    timed(s"Kmv.differenceEstimate x$mult") {
      val ud = expr("user_id * 100000 + unix_micros(ts) div 86400000000")
      val a = ev.filter($"event_type" === "click").select(ud.as("ud"))
      val b = ev.filter($"event_type" === "purchase").select(ud.as("ud"))
      val r = graft.operators.Kmv.differenceEstimate(
        graft.operators.Kmv.sketch(a, Nil, "ud", 256),
        graft.operators.Kmv.sketch(b, Nil, "ud", 256), 256).head
      println(s"[probe]   n_cand=${r.getAs[Long]("n_cand")} " +
        f"est=${r.getAs[Double]("est_diff")}%.0f")
    }

    timed(s"Suppress.suppressUnchanged x$mult") {
      val n = graft.cdc.Suppress.suppressUnchanged(
          ev.filter($"value".isNotNull)
            .withColumn("band", floor($"value" / 100).cast("long")),
          "user_id", "ts", "event_id", Seq("band", "event_type"))
        .count()
      println(s"[probe]   kept=$n")
    }

    // DENSE id stride (kmeansCentroids' strided init needs dense
    // 0-based ids — the ScaleDataGen discipline)
    val emb0 = Tables(spark, dir, "embeddings")
    val embStride = emb0.count()
    val emb = (0 until mult).map { i =>
      emb0.select(($"vec_id" + lit(i.toLong * embStride)).as("vec_id"),
        $"embedding", $"label")
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] embeddings x$mult: ${emb.count()} rows")

    timed(s"SemDedup.diversitySample x$mult (k scaling with n)") {
      val k = math.max(8L, emb.count() / 250L).toInt
      val n = graft.operators.SemDedup.diversitySample(emb, "vec_id",
        "embedding", k = k, iters = 1, budget = 1000, salt = "p:").count()
      println(s"[probe]   selected=$n (k=$k)")
    }

    // fixed k: the diversity-sampling regime (k = number of semantic
    // modes, independent of corpus size) — assign cost is n·k, linear
    // in n; the k∝n rule above is the SemDeDup pair-scan regime
    timed(s"SemDedup.diversitySample x$mult (fixed k=80)") {
      val n = graft.operators.SemDedup.diversitySample(emb, "vec_id",
        "embedding", k = 80, iters = 1, budget = 1000, salt = "p:").count()
      println(s"[probe]   selected=$n")
    }

    spark.stop()
  }
}
