package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-11 wave-D operators (interval overlap join,
  * label-propagation communities, windowed funnel): disjoint shifted-id
  * copies. Claimed shapes:
  *
  *  - Intervals.overlapJoin: equi shuffle on time bins (fan-out =
  *    len/bin + 1), pairs filtered in-bin, canonical-bin emission — no
  *    nested-loop matrix at any scale; cost tracks pairs + fan-out;
  *  - Communities.labelPropagation: per round one edge⋈label join + two
  *    node-keyed aggregations off a once-materialized edge frame (the
  *    PageRank shape);
  *  - Funnel.maxGapUs: same per-stage join chain as the unbounded
  *    funnel — the bound is a scan-side predicate, no new shuffle.
  *
  * Usage: Round11WaveDProbe <sfDir> [mult]   (default mult = 10)
  */
object Round11WaveDProbe {
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
        ($"user_id" + lit(i.toLong * 10000000L)).as("user_id"),
        $"ts", $"event_type", $"value")
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] events x$mult: ${ev.count()}")

    timed(s"intervalOverlapJoin sessions x incidents x$mult") {
      val sessions = graft.operators.Temporal.sessionIndex(ev,
          key = "user_id", tsCol = "ts", tieCol = "event_id",
          gapMicros = 1800000000L)
        .groupBy($"user_id", $"_session")
        .agg(min($"event_id").as("session_id"),
          min(unix_micros($"ts")).as("s_start"),
          max(unix_micros($"ts")).as("s_end"))
        .select($"user_id", $"session_id", $"s_start", $"s_end")
      val incidents = ev.filter($"event_type" === "error" &&
          pmod($"event_id", lit(50L)) === 0L)
        .select($"event_id".as("incident_id"),
          unix_micros($"ts").as("i_start"),
          (unix_micros($"ts") + lit(3600000000L)).as("i_end"))
      println(s"[probe]   pairs=${graft.operators.Intervals.overlapJoin(
        sessions, incidents, "s_start", "s_end", "i_start", "i_end",
        binUs = 3600000000L).count()}")
    }

    val li0 = Tables(spark, dir, "lineitem")
    val ord0 = Tables(spark, dir, "orders")
    val edges = (0 until mult).map { i =>
      ord0.join(li0, $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2 + lit(i.toLong * 10000000L)).as("a"),
          ($"l_suppkey" * 2 + 1 + lit(i.toLong * 10000000L)).as("b"))
    }.reduce(_ unionByName _).distinct().localCheckpoint(true)
    println(s"[probe] trade edges x$mult: ${edges.count()}")
    timed(s"labelPropagation 2 rounds x$mult") {
      val sym = edges.select($"a".as("src"), $"b".as("dst"))
        .union(edges.select($"b".as("src"), $"a".as("dst")))
      println(s"[probe]   communities=${graft.operators.Communities
        .labelPropagation(sym, "src", "dst", rounds = 2)
        .select($"community").distinct().count()}")
    }

    timed(s"windowed funnel x$mult") {
      println(s"[probe]   rows=${graft.operators.Funnel.funnelCounts(ev,
        "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"),
        maxGapUs = Some(172800000000L)).count()}")
    }

    spark.stop()
  }
}
