package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-11 operators (incremental connected
  * components, multi-pass fuzzy ER, dangling-redistributed PageRank,
  * MAD outliers): synthetic corpora scaled `mult`× with disjoint shifted
  * ids (the ScaleDataGen discipline — cardinalities scale with data).
  * Evidence for the claimed shapes:
  *
  *  - Components.mergeBatchEdges: a fixed-size DELTA batch against a
  *    `mult`×-bigger membership table costs two membership hash joins +
  *    delta-sized propagation — delta merge time should stay near-flat
  *    while the one-shot recompute grows with the graph;
  *  - fuzzyPairsMultiPass ≈ 2× fuzzyPairs (two linear passes);
  *  - pageRank(redistributeDangling) adds one 1-row aggregate per round
  *    over the rank frame — same growth as the plain form;
  *  - Robust.madOutliers runs over the (key, day) pre-aggregate, so its
  *    cost is the daily groupBy scan, flat in the day-frame size.
  *
  * Usage: Round11ScaleProbe <sfDir> [mult]   (default mult = 10)
  */
object Round11ScaleProbe {
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

    // --- synthetic near-dup-shaped edge graph: `20k·mult` clusters of
    // size 2-5 (the dense-tiny regime the operator documents), plus a
    // FIXED-size delta of fresh edges, some of which merge existing
    // clusters (the hard case).
    val nClusters = 20000L * mult
    val base = spark.range(nClusters).select(
        ($"id" * 8).as("c"),
        explode(sequence(lit(1), (pmod($"id", lit(4)) + 1).cast("int")))
          .as("k"))
      .select(($"c").as("id_a"), ($"c" + $"k").as("id_b"))
      .localCheckpoint(true)
    val deltaEdges = spark.range(5000).select(
        (($"id" * 971) % nClusters * 8).as("id_a"),
        ((($"id" * 971) % nClusters * 8) + 6).as("id_b"))
      .union(spark.range(500).select( // cluster-MERGING edges
        (($"id" * 37) % nClusters * 8).as("id_a"),
        ((($"id" * 37 + 1) % nClusters) * 8).as("id_b")))
      .localCheckpoint(true)
    println(s"[probe] graph x$mult: ${base.count()} base edges, " +
      s"${deltaEdges.count()} delta edges")

    timed(s"Components one-shot (base+delta) x$mult") {
      val n = graft.operators.Components
        .connectedComponents(base.union(deltaEdges)).count()
      println(s"[probe]   nodes=$n")
    }

    val salt = java.util.UUID.randomUUID.toString.take(8).replace("-", "")
    val table = s"probe_cc_$salt"
    val tmp = java.nio.file.Files.createTempDirectory(s"probe_cc_$salt")
      .toString
    try {
      timed(s"Components.mergeBatchEdges BASE batch x$mult") {
        graft.operators.Components.mergeBatchEdges(base, table,
          s"$tmp/state", batchId = 0L)
      }
      timed(s"Components.mergeBatchEdges FIXED delta vs x$mult table") {
        graft.operators.Components.mergeBatchEdges(deltaEdges, table,
          s"$tmp/state", batchId = 1L)
      }
      val m = graft.operators.Components.componentsFromTable(spark, table)
      println(s"[probe]   membership rows=${m.count()}")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }

    // --- fuzzy ER: disjoint-copy customer names (ScaleDataGen's c_name
    // suffix discipline so copies never pair with each other)
    val cust0 = Tables(spark, dir, "customer")
    val cust = (0 until mult).map { i =>
      cust0.select(($"c_custkey" + lit(i.toLong * 10000000L)).as("id"),
        concat($"c_name", lit(s"#$i")).as("name"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] customers x$mult: ${cust.count()} rows")

    timed(s"fuzzyPairs single pass x$mult") {
      println(s"[probe]   pairs=${graft.operators.EntityResolution
        .fuzzyPairs(cust, "id", "name", 8, 2).count()}")
    }
    timed(s"fuzzyPairsMultiPass x$mult") {
      println(s"[probe]   pairs=${graft.operators.EntityResolution
        .fuzzyPairsMultiPass(cust, "id", "name", 8, 2).count()}")
    }

    // --- PageRank on the order graph (directed, dangling sinks real)
    val ord0 = Tables(spark, dir, "orders")
    val edges = (0 until mult).map { i =>
      ord0.select(($"o_custkey" + lit(i.toLong * 10000000L)).as("src"),
        ($"o_orderkey" + lit(i.toLong * 100000000L)).as("dst"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] order edges x$mult: ${edges.count()} rows")

    timed(s"pageRank plain x$mult") {
      println(s"[probe]   nodes=${graft.operators.PageRank
        .pageRank(edges, "src", "dst", iterations = 3).count()}")
    }
    timed(s"pageRank redistributeDangling x$mult") {
      println(s"[probe]   nodes=${graft.operators.PageRank
        .pageRank(edges, "src", "dst", iterations = 3,
          redistributeDangling = true).count()}")
    }

    // --- MAD outliers over the daily pre-aggregate of mult× events
    val ev0 = Tables(spark, dir, "events")
    val ev = (0 until mult).map { i =>
      ev0.select(($"event_id" + lit(i.toLong * 1000000000L)).as("event_id"),
        $"ts", concat($"event_type", lit(s"#$i")).as("event_type"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] events x$mult: ${ev.count()} rows")

    timed(s"Robust.madOutliers daily x$mult") {
      val daily = ev.groupBy($"event_type", to_date($"ts").as("d"))
        .agg(count(lit(1)).as("n"))
      val r = graft.operators.Robust.madOutliers(daily, Seq("event_type"), "n")
      println(s"[probe]   rows=${r.count()} outliers=${r
        .filter($"is_outlier").count()}")
    }

    spark.stop()
  }
}
