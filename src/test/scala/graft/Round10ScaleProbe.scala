package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-10 operators (Kmv sketch/intersection,
  * fixed-point PageRank, sorted-neighborhood fuzzy pairs, exact-moment
  * statistics): times each on the sf dir's tables replicated `mult`×
  * with shifted ids (disjoint copies — cardinalities scale with data,
  * the ScaleDataGen discipline). Evidence the claimed plan shapes hold
  * at 10×/100×.
  *
  * Usage: Round10ScaleProbe <sfDir> [mult]   (default mult = 10)
  */
object Round10ScaleProbe {
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

    // KMV: two audience sketches + direct intersection
    timed(s"Kmv sketch+intersect x$mult") {
      val ud = expr("user_id * 100000 + unix_micros(ts) div 86400000000")
      val a = ev.filter($"event_type" === "click").select(ud.as("ud"))
      val b = ev.filter($"event_type" === "purchase").select(ud.as("ud"))
      val ska = graft.operators.Kmv.sketch(a, Nil, "ud", 256)
      val skb = graft.operators.Kmv.sketch(b, Nil, "ud", 256)
      val r = graft.operators.Kmv.intersectEstimate(ska, skb, 256).head
      println(s"[probe]   n_cand=${r.getAs[Long]("n_cand")} " +
        f"est=${r.getAs[Double]("est_intersect")}%.0f")
    }

    // PageRank on the replicated trade graph (disjoint copies: keys shift)
    val o0 = Tables(spark, dir, "orders")
    val li0 = Tables(spark, dir, "lineitem")
    val edges0 = o0.join(li0, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct().localCheckpoint(true)
    val edges = (0 until mult).map { i =>
      edges0.select((($"o_custkey" + lit(i.toLong * 10000000L)) * 2).as("a"),
        (($"l_suppkey" + lit(i.toLong * 10000000L)) * 2 + 1).as("b"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] edges x$mult: ${edges.count()} directed-pairs")
    timed(s"PageRank 3 iters x$mult") {
      val sym = edges.select($"a".as("src"), $"b".as("dst"))
        .union(edges.select($"b".as("src"), $"a".as("dst")))
      val pr = graft.operators.PageRank.pageRank(sym, "src", "dst", 3)
      println(s"[probe]   nodes=${pr.count()}")
    }

    // sorted-neighborhood fuzzy pairs on replicated customers
    val c0 = Tables(spark, dir, "customer")
    val cust = (0 until mult).map { i =>
      c0.select(($"c_custkey" + lit(i.toLong * 10000000L)).as("c_custkey"),
        concat($"c_name", lit(f"-$i%03d")).as("c_name"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    timed(s"fuzzyPairs w=8 d<=1 x$mult") {
      val n = graft.operators.EntityResolution.fuzzyPairs(
        cust, "c_custkey", "c_name", w = 8, maxDist = 1).count()
      println(s"[probe]   pairs=$n")
    }

    // exact-moment statistics on replicated lineitem
    val li = (0 until mult).map { i =>
      li0.select($"l_returnflag",
        floor($"l_quantity").cast("long").as("x"),
        floor($"l_extendedprice".cast("decimal(12,2)")).cast("long").as("y"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    timed(s"bivariateStats x$mult") {
      val r = graft.operators.Moments.bivariateStats(li,
        Seq("l_returnflag"), "x", "y").collect()
      println(s"[probe]   groups=${r.length}")
    }

    // co-occurrence projection + triangles on replicated baskets
    // (disjoint copies: order and part keys both shift)
    val baskets = (0 until mult).map { i =>
      li0.select(($"l_orderkey" + lit(i.toLong * 100000000L)).as("b"),
        ($"l_partkey" + lit(i.toLong * 10000000L)).as("i"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    timed(s"CoOccurrence.project + triangleCounts x$mult") {
      val edges = graft.operators.CoOccurrence.project(
        baskets, "b", "i", minShared = 2L, maxBasketSize = 32)
      val tri = graft.operators.Triangles.triangleCounts(edges)
      println(s"[probe]   tri_nodes=${tri.count()}")
    }

    spark.stop()
  }
}
