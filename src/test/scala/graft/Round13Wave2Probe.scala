package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-13 wave-2 operators (weighted SSSP, HITS,
  * DSIR importance weights + Gumbel resample): disjoint shifted-id copies
  * of the sf tables. Claimed shapes under test:
  *
  *  - Components.sssp: delta-frontier Bellman-Ford — shifted copies are
  *    disjoint components, so the round count stays FLAT while frontier
  *    mass scales linearly; per-round cost is one key-shuffle join +
  *    groupBy-min;
  *  - Hits.hits: 2 joins + 2 groupBy-sums + two 1-row aggregates per
  *    iteration, iteration count fixed — linear in edges;
  *  - Dsir.importanceWeights: one gram-explode scan + a broadcast join
  *    against the fixed 4096-bucket stats table + one groupBy(doc) —
  *    linear in corpus tokens, bucket table size CONSTANT;
  *  - Dsir.resample: bounded-heap TopK — at most k structs per map task
  *    cross the shuffle regardless of corpus size.
  *
  * Usage: Round13Wave2Probe <sfDir> [mult]   (default mult = 10)
  */
object Round13Wave2Probe {
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

    // ---- graphs: the q39/q40 constructions at 1x and mult-x ----------
    def graph(m: Int) = {
      val shift = (i: Int) => lit(i.toLong * 1000000000L)
      val ords = Tables(spark, dir, "orders")
      val lis = Tables(spark, dir, "lineitem")
      val co = (0 until m).map { i =>
        ords.select(($"o_custkey".cast("long") * 3 + shift(i)).as("a"),
          ($"o_orderkey".cast("long") * 3 + 1 + shift(i)).as("b"))
      }.reduce(_ unionByName _)
      val op = (0 until m).map { i =>
        lis.filter($"l_partkey" % 5 === 0)
          .select(($"l_orderkey".cast("long") * 3 + 1 + shift(i)).as("a"),
            ($"l_partkey".cast("long") * 3 + 2 + shift(i)).as("b"))
      }.reduce(_ unionByName _)
      val ce = co.union(op).distinct()
        .select($"a", $"b", (lit(1L) + ($"a" + $"b") % 7).as("w"))
      val sym = ce.select($"a".as("src"), $"b".as("dst"), $"w")
        .union(ce.select($"b".as("src"), $"a".as("dst"), $"w"))
        .localCheckpoint(true)
      val seeds = (0 until m).map { i =>
        Tables(spark, dir, "customer")
          .filter($"c_nationkey" === 7 && $"c_custkey" % 50 === 3)
          .select(($"c_custkey".cast("long") * 3 + shift(i)).as("node"))
      }.reduce(_ unionByName _).localCheckpoint(true)
      (sym, seeds)
    }
    for (m <- Seq(1, mult)) {
      val (sym, seeds) = graph(m)
      println(s"[probe] sssp graph x$m: edges=${sym.count()}, " +
        s"seeds=${seeds.count()}")
      timed(s"sssp x$m") {
        println(s"[probe]   reached=${graft.operators.Components
          .sssp(sym, "src", "dst", "w", seeds, "node").count()}")
      }
    }

    def digraph(m: Int) = {
      val shift = (i: Int) => lit(i.toLong * 1000000000L)
      (0 until m).map { i =>
        Tables(spark, dir, "orders")
          .join(Tables(spark, dir, "lineitem"),
            $"l_orderkey" === $"o_orderkey")
          .select(($"o_custkey".cast("long") * 2 + shift(i)).as("src"),
            ($"l_partkey".cast("long") * 2 + 1 + shift(i)).as("dst"))
      }.reduce(_ unionByName _).localCheckpoint(true)
    }
    for (m <- Seq(1, mult)) {
      val e = digraph(m)
      println(s"[probe] hits digraph x$m: edges=${e.count()}")
      timed(s"hits x$m") {
        println(s"[probe]   nodes=${graft.operators.Hits
          .hits(e, "src", "dst", iterations = 3).count()}")
      }
    }

    // ---- DSIR over shifted-id document copies -------------------------
    def corpus(m: Int) = (0 until m).map { i =>
      Tables(spark, dir, "documents")
        .select(($"doc_id" + lit(i.toLong * 1000000000L)).as("doc_id"),
          $"text", $"source")
    }.reduce(_ unionByName _).localCheckpoint(true)
    for (m <- Seq(1, mult)) {
      val docs = corpus(m)
      val target = docs.filter($"source".isin("src0", "src1", "src2", "src3"))
      println(s"[probe] dsir corpus x$m: docs=${docs.count()}")
      val wts = timed(s"dsir importanceWeights x$m") {
        val w = graft.operators.Dsir
          .importanceWeights(docs, "doc_id", "text", target, "text")
          .localCheckpoint(true)
        println(s"[probe]   scored=${w.count()}")
        w
      }
      timed(s"dsir resample top-64 x$m") {
        println(s"[probe]   picked=${graft.operators.Dsir
          .resample(wts, "doc_id", "logw", k = 64, seed = "dsir-13")
          .count()}")
      }
    }
    spark.stop()
  }
}
