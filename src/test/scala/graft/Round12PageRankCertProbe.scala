package graft

import org.apache.spark.sql.functions._

/** Round-12 sf1 certification of `q16_pagerank_dangling` WITHOUT DuckDB
  * (VERDICT r11 ask #3 — the oracle spills >79 GB at sf1, so the
  * heavyweight certifies Spark-side):
  *
  *  1. layout invariance: the redistributed 3-round result over the sf1
  *     bipartite trade graph is bit-identical when the edge frame
  *     arrives under a different partition layout;
  *  2. scalar equality: a sampled subgraph (custkey stratum) runs both
  *     the distributed operator and a single-threaded scalar loop of the
  *     same long arithmetic — bit-equal;
  *  3. mass conservation: total mass within the floor-leakage band
  *     (> 0.99·scale, ≤ scale) — the PageRankSpec bound at 100× the
  *     spec's data.
  *
  * Writes `bench/pagerank_cert_r12.json` beside the sf1 bench leg.
  *
  * Usage: Test/runMain graft.Round12PageRankCertProbe [sfDir]
  */
object Round12PageRankCertProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_scale/sf1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val edges = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "lineitem"), $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nEdges = edges.count()

    def run(e: org.apache.spark.sql.DataFrame) =
      graft.operators.PageRank.pageRank(e, "src", "dst", iterations = 3,
        redistributeDangling = true)

    // 1) layout invariance at sf1: default layout vs a dst-keyed one
    val t0 = System.nanoTime()
    val a = run(edges).localCheckpoint(true)
    val wallA = (System.nanoTime() - t0) / 1e9
    val b = run(edges.repartition(53, $"dst")).localCheckpoint(true)
    val nNodes = a.count()
    val mismatches = a.alias("a")
      .join(b.alias("b"), $"a.node" === $"b.node", "full_outer")
      .filter($"a.pr".isNull || $"b.pr".isNull || $"a.pr" =!= $"b.pr")
      .count()
    println(s"CERT layout: nodes=$nNodes edges=$nEdges mismatches=$mismatches" +
      f" wall=$wallA%.1fs")
    require(mismatches == 0L, "layout permutation changed the result")

    // 2) mass conservation within the floor-leakage band
    val scale = 1000000000000L
    val total = a.agg(sum($"pr")).head().getLong(0)
    println(s"CERT mass: total=$total scale=$scale " +
      f"ratio=${total.toDouble / scale}%.6f")
    require(total <= scale && total > scale / 100L * 99L,
      s"mass out of band: $total")

    // 3) scalar single-threaded reference on a sampled subgraph
    //    (custkey stratum: ~1/37 of customers and every edge they source)
    val sub = edges.filter(pmod($"src" / 2, lit(37)) === 3)
      .localCheckpoint(true)
    val subEdges = sub.as[(Long, Long)].collect().toSeq
    println(s"CERT subgraph: edges=${subEdges.size}")
    val gotSub = run(sub).as[(Long, Long)].collect().toMap
    val refSub = referenceDangling(subEdges, iters = 3, scale = scale)
    require(gotSub == refSub, "distributed result != scalar reference " +
      s"(got ${gotSub.size} nodes, ref ${refSub.size})")
    println("CERT scalar: bit-equal on the sampled subgraph")

    val json =
      s"""{"probe":"Round12PageRankCertProbe","sf_dir":"$dir",
         |"nodes":$nNodes,"edges":$nEdges,"wall_s_3iter":$wallA,
         |"layout_mismatches":$mismatches,
         |"mass_total":$total,"mass_scale":$scale,
         |"mass_ratio":${total.toDouble / scale},
         |"subgraph_edges":${subEdges.size},
         |"subgraph_nodes":${refSub.size},
         |"scalar_bit_equal":true}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench/pagerank_cert_r12.json"), json.getBytes)
    println("CERT artifact -> bench/pagerank_cert_r12.json")
    spark.stop()
  }

  /** Single-threaded scalar loop — the PageRankSpec referenceDangling,
    * re-stated here so the certification is self-contained.
    */
  private def referenceDangling(edges: Seq[(Long, Long)], iters: Int,
                                scale: Long): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toLong
    val s0 = scale / n
    val base = 15L * s0 / 100L
    var pr = nodes.map(_ -> s0).toMap
    for (_ <- 1 to iters) {
      val share = nodes.filterNot(deg.contains).map(pr).sum / n
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / deg(s) }.sum
      }
      pr = nodes.map(v =>
        v -> (base + 85L * (in.getOrElse(v, 0L) + share) / 100L)).toMap
    }
    pr
  }
}
