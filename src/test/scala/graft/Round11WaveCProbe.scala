package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-11 wave-C operators (bloom-prefiltered join,
  * privacy audit/enforcement, SCD3, interpolation resample): disjoint
  * shifted-id copies of the sf tables. Claimed shapes under test:
  *
  *  - JoinPrune.bloomPrefilteredJoin: one dim aggregate + a codegen'd
  *    literal prefilter — fact rows entering the shuffle drop to the
  *    match mass; compares against the plain join at the same scale
  *    (broadcast disabled on both so the exchange is the cost);
  *  - Privacy.privacyAudit / enforceKAnonymity: one scan / scan + a
  *    broadcast semi-join — |groups| is layout-bound, not data-bound;
  *  - Scd.scd3: one key-shuffle window + a reused-partitioning groupBy;
  *  - Temporal.resampleInterpolate: binned aggregate + per-key grid,
  *    two window passes over one partitioning.
  *
  * Usage: Round11WaveCProbe <sfDir> [mult]   (default mult = 10)
  */
object Round11WaveCProbe {
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

    val li0 = Tables(spark, dir, "lineitem")
    val ord0 = Tables(spark, dir, "orders")
    val li = (0 until mult).map { i =>
      li0.withColumn("l_orderkey", $"l_orderkey" + lit(i.toLong * 100000000L))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val ord = (0 until mult).map { i =>
      ord0.withColumn("o_orderkey", $"o_orderkey" + lit(i.toLong * 100000000L))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] lineitem x$mult: ${li.count()}, orders: ${ord.count()}")

    val urgent = ord.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_orderdate")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    timed(s"plain shuffle join (no broadcast) x$mult") {
      println(s"[probe]   rows=${li.join(urgent,
        li("l_orderkey") === urgent("o_orderkey")).count()}")
    }
    timed(s"bloomPrefilteredJoin (no broadcast) x$mult") {
      println(s"[probe]   rows=${graft.operators.JoinPrune
        .bloomPrefilteredJoin(li, urgent, "l_orderkey", "o_orderkey")
        .count()}")
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    val cust0 = Tables(spark, dir, "customer")
    val cust = (0 until mult).map { i =>
      cust0.withColumn("c_custkey", $"c_custkey" + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _).localCheckpoint(true)
    timed(s"privacyAudit x$mult") {
      println(s"[probe]   groups=${graft.operators.Privacy.privacyAudit(
        cust, Seq("c_nationkey", "c_mktsegment"), "c_acctbal", 12L, 3L)
        .count()}")
    }
    timed(s"enforceKAnonymity x$mult") {
      println(s"[probe]   kept=${graft.operators.Privacy.enforceKAnonymity(
        cust, Seq("c_nationkey", "c_mktsegment"), 12L).count()}")
    }

    val ev0 = Tables(spark, dir, "events")
    val ev = (0 until mult).map { i =>
      ev0.select(($"event_id" + lit(i.toLong * 1000000000L)).as("event_id"),
        ($"user_id" + lit(i.toLong * 10000000L)).as("user_id"),
        $"ts", $"event_type", $"value")
    }.reduce(_ unionByName _)
      .withColumn("op", graft.cdc.EventsAsChangeLog.opCol)
      .localCheckpoint(true)
    println(s"[probe] events x$mult: ${ev.count()}")
    timed(s"scd3 (2 tracked attrs) x$mult") {
      println(s"[probe]   keys=${graft.cdc.Scd.scd3(ev, Seq("user_id"),
        "ts", "event_id", "op", Seq("value", "event_type")).count()}")
    }
    timed(s"resampleInterpolate daily x$mult") {
      println(s"[probe]   bins=${graft.operators.Temporal
        .resampleInterpolate(ev.filter($"value".isNotNull), "user_id",
          "ts", "value", 86400000000L).count()}")
    }

    spark.stop()
  }
}
