// spark-shell -I script (round-15 evidence): the per-round physical plans
// of the HyperBall max-merge — the OLD tall (node, bucket, rho) round
// (replicated verbatim from the pre-optimization runRounds, git history
// bcfe835^..f1ac5b9 HyperBall.scala) next to the NEW wide (node, r0..r15)
// round — on the real sf0.1 tripartite gate graph. The final-query plans
// under plans/r15/ cannot show these (readouts aggregate cached per-round
// RDDs); this is the plan evidence for the wide-register claim.
// Env: RP_OUT (output dir). Run: spark-shell -I tools/round_plans_r15.sc
import org.apache.spark.sql.functions._
import graft.functions.SplitMix64.{leading_zeros64, splitmix64}
import java.nio.file.{Files, Paths}
spark.sparkContext.setLogLevel("ERROR")
val outDir = sys.env.getOrElse("RP_OUT", "plans/r15")
Files.createDirectories(Paths.get(outDir))
val dir = "/root/testdata/sf0.1"
val p = 4; val m = 1 << p

// tripartiteGraph replica (queries/Relational.scala)
val co = graft.Tables(spark, dir, "orders").select(
  (col("o_custkey").cast("long") * 3).as("a"),
  (col("o_orderkey").cast("long") * 3 + 1).as("b"))
val op = graft.Tables(spark, dir, "lineitem")
  .filter(col("l_partkey") % 5 === 0).select(
    (col("l_orderkey").cast("long") * 3 + 1).as("a"),
    (col("l_partkey").cast("long") * 3 + 2).as("b"))
val ce = co.union(op).distinct()
val edges = ce.select(col("a").as("src"), col("b").as("dst"))
  .union(ce.select(col("b").as("src"), col("a").as("dst")))

val e = edges.select(col("src").cast("long").as("src"),
    col("dst").cast("long").as("dst"))
  .filter(col("src").isNotNull && col("dst").isNotNull &&
    col("src") =!= col("dst"))
  .distinct().localCheckpoint(true)
val nodes = e.select(col("src").as("node"))
  .union(e.select(col("dst").as("node"))).distinct()
val h = splitmix64(col("node"))
val selfRegs = nodes.select(col("node"),
  shiftrightunsigned(h, 64 - p).as("bucket"),
  least(leading_zeros64(shiftleft(h, p)) + 1, lit(53)).cast("int").as("rho"))

def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
  Files.writeString(Paths.get(s"$outDir/$name.txt"),
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

// ---- BEFORE: tall round — regs is V·2^p (node, bucket, rho) rows;
// the join matches E·2^p register rows and the merge groupBy shuffles
// (V + E)·2^p tall rows
val regsTall = selfRegs.localCheckpoint(true)
dump("hyperball_round_before_tall",
  regsTall.union(
      e.join(regsTall.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("bucket"), col("rho")))
    .groupBy(col("node"), col("bucket"))
    .agg(max(col("rho")).as("rho")))

// ---- AFTER: wide round — regs is V (node, r0..r15) rows; the join
// matches E edge rows, the contribution aggregate map-side-combines per
// src before its exchange, and the merge groupBy shuffles ~2V wide rows
val widen = selfRegs.groupBy(col("node")).agg(
  coalesce(max(when(col("bucket") === 0, col("rho"))), lit(0)).as("r0"),
  (1 until m).map(b =>
    coalesce(max(when(col("bucket") === b, col("rho"))), lit(0))
      .as(s"r$b")): _*)
val regsWide = widen.localCheckpoint(true)
val maxes = (0 until m).map(b => max(col(s"r$b")).as(s"r$b"))
val contrib = e.join(regsWide.withColumnRenamed("node", "dst"), Seq("dst"))
  .groupBy(col("src").as("node")).agg(maxes.head, maxes.tail: _*)
dump("hyperball_round_after_wide",
  regsWide.unionByName(contrib).groupBy(col("node"))
    .agg(maxes.head, maxes.tail: _*))
System.exit(0)
