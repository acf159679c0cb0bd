package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Round-16 plan evidence (measurement tooling only, the PlanDump /
  * round_plans_r15 discipline): the PER-ROUND physical plans of the three
  * iterative shapes this round restructures, old form next to new form,
  * on the real sf0.1 gate graphs. The final-query plans under plans/r16/
  * cannot show these (the loops checkpoint per round, so the returned
  * frame's plan is a readout over ExistingRDD scans); this tool replays
  * ONE mid-loop round (round 2 — round 1 is identical in both forms) the
  * old way and the new way and dumps both.
  *
  *   runMain graft.RoundPlans16 <sfDir> <outDir>
  *
  * 1. Bellman-Ford relax round (Components.relaxToFixpoint; q39_sssp,
  *    q39_sssp_incr): OLD = per-round union+groupBy rewrite of the FULL
  *    dist frame (V-sized exchange + checkpoint) + next joining that
  *    materialized frame; NEW = next joins a LAZY union-min over the
  *    checkpointed layers, nothing V-sized is rewritten.
  * 2. Min-label propagation round (Components.connectedComponents and
  *    stronglyConnectedComponents.minLabels — same shape; doc_dup_*
  *    family, q47_scc): OLD = labels ∪ (edges ⋈ FULL labels) groupBy-min,
  *    V-sized rewrite per round; NEW = edges ⋈ DELTA + improvement filter
  *    against the lazy layer fold, delta-sized checkpoint.
  * 3. HITS half-step (Hits.hits; q40_hits): OLD = the join+groupBy
  *    contribution subtree executed under TWO actions per half-step (the
  *    1-row mass aggregate AND the checkpoint of the normalized
  *    projection) — dumped as two plans each containing the full subtree;
  *    NEW = the subtree materializes once, the mass aggregate reads the
  *    ExistingRDD scan.
  */
object RoundPlans16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String, df: DataFrame): Unit =
      Files.writeString(Paths.get(s"$outDir/$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))

    // ---- 1. Bellman-Ford relax round on the q39 weighted tripartite graph
    locally {
      val co = Tables(spark, sfDir, "orders")
        .select((col("o_custkey").cast("long") * 3).as("a"),
          (col("o_orderkey").cast("long") * 3 + 1).as("b"))
      val op = Tables(spark, sfDir, "lineitem")
        .filter(col("l_partkey") % 5 === 0)
        .select((col("l_orderkey").cast("long") * 3 + 1).as("a"),
          (col("l_partkey").cast("long") * 3 + 2).as("b"))
      val ce = co.union(op).distinct()
        .select(col("a"), col("b"), (lit(1L) + (col("a") + col("b")) % 7).as("w"))
      val e = ce.select(col("a").as("src"), col("b").as("dst"), col("w"))
        .union(ce.select(col("b").as("src"), col("a").as("dst"), col("w")))
        .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
        .localCheckpoint(true)
      val start = Tables(spark, sfDir, "customer")
        .filter(col("c_nationkey") === 7 && col("c_custkey") % 50 === 3)
        .select((col("c_custkey").cast("long") * 3).as("node"))
        .distinct().withColumn("dist", lit(0L))
        .localCheckpoint(true)
      def relaxed(frontier: DataFrame, best: DataFrame): DataFrame = e
        .join(frontier.select(col("node").as("src"), col("dist").as("fd")),
          Seq("src"))
        .select(col("dst").as("node"), (col("fd") + col("w")).as("nd"))
        .groupBy(col("node")).agg(min(col("nd")).as("nd"))
        .join(best, Seq("node"), "left")
        .filter(col("dist").isNull || col("nd") < col("dist"))
        .select(col("node"), col("nd").as("dist"))
      // run round 1 for real (identical in both forms) to get layer 1
      val next1 = relaxed(start, start).localCheckpoint(true)
      // OLD round 2: the full-dist rewrite + next joining it
      val dist2Old = start.union(next1)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      dump("sssp_round_before_dist_rewrite", dist2Old)
      val dist2OldMat = dist2Old.localCheckpoint(true)
      dump("sssp_round_before_next", relaxed(next1, dist2OldMat))
      // NEW round 2: next joins the lazy union-min over the layers;
      // no V-sized frame is rewritten or checkpointed
      val bestLazy = start.union(next1)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      dump("sssp_round_after_next", relaxed(next1, bestLazy))
    }

    // ---- 2. connectedComponents round on the doc near-dup pair graph
    // (a tiny synthetic stand-in with the same shape: the plan shape is
    // input-independent; using synthetic edges keeps this tool free of
    // the full LSH pipeline)
    locally {
      val raw = spark.range(0, 100000L)
        .select(col("id").as("u"), ((col("id") + 7) % 100000L).as("v"))
      val e = raw.select(col("u"), col("v"))
        .union(raw.select(col("v").as("u"), col("u").as("v")))
        .distinct().localCheckpoint(true)
      val labels0 = e.select(col("u").as("id")).distinct()
        .withColumn("lbl", col("id")).localCheckpoint(true)
      // round 1 (both forms identical): delta = labels0
      val next1 = e.join(labels0, e("v") === labels0("id"))
        .select(e("u").as("id"), labels0("lbl").as("lbl"))
        .groupBy("id").agg(min("lbl").as("lbl"))
        .join(labels0.withColumnRenamed("lbl", "cur"), Seq("id"))
        .filter(col("lbl") < col("cur"))
        .select(col("id"), col("lbl"))
        .localCheckpoint(true)
      // OLD round 2: labels ∪ (e ⋈ FULL labels) groupBy-min — V-sized
      // rewrite, checkpointed every round
      val labels1Old = labels0.union(next1)
        .groupBy("id").agg(min("lbl").as("lbl")).localCheckpoint(true)
      dump("cc_round_before",
        labels1Old.select(col("id"), col("lbl"))
          .union(e.join(labels1Old, e("v") === labels1Old("id"))
            .select(e("u").as("id"), labels1Old("lbl").as("lbl")))
          .groupBy("id").agg(min("lbl").as("lbl")))
      // NEW round 2: e ⋈ DELTA + improvement filter vs the lazy fold —
      // delta-sized join and checkpoint, no V-sized rewrite
      val bestLazy = labels0.union(next1)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
      dump("cc_round_after",
        e.join(next1, e("v") === next1("id"))
          .select(e("u").as("id"), next1("lbl").as("lbl"))
          .groupBy("id").agg(min("lbl").as("lbl"))
          .join(bestLazy.withColumnRenamed("lbl", "cur"), Seq("id"))
          .filter(col("lbl") < col("cur"))
          .select(col("id"), col("lbl")))
    }

    // ---- 3. HITS half-step on the q40 purchase graph
    locally {
      val e = Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "lineitem"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_partkey").cast("long") * 2 + 1).as("dst"))
        .distinct().localCheckpoint(true)
      val h = e.select(col("src").as("node")).distinct()
        .withColumn("h", lit(1000000000L)).localCheckpoint(true)
      val raw = e.join(h.select(col("node").as("src"), col("h")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("auth"))
      // OLD: the contribution subtree executes under BOTH of these actions
      dump("hits_halfstep_before_mass_job", raw.agg(sum(col("auth"))))
      dump("hits_halfstep_before_checkpoint_job",
        raw.select(col("node"), expr("auth div 3L").as("auth")))
      // NEW: the subtree materializes once; the mass aggregate reads the
      // materialized scan
      val m = raw.localCheckpoint(true)
      dump("hits_halfstep_after_mass_job", m.agg(sum(col("auth"))))
      dump("hits_halfstep_after_normalized",
        m.select(col("node"), expr("auth div 3L").as("auth")))
    }

    spark.stop()
  }
}
