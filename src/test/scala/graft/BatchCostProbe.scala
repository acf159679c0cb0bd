package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.cdc.{Fixtures, Validate}
import graft.sources.Ledger

/** Decomposes the fixed per-micro-batch cost of the streaming pipeline on a
  * WARM session: plan construction+analysis+optimization, core execution,
  * store write commit, publish write commit. Informs where to attack the
  * ~3 s fixed cost (VERDICT r3 #1).
  */
object BatchCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val perSeg = 5000
    def mkLedger(nSegs: Int, startId: Int): String = {
      val ledger = Files.createTempDirectory("ledger").toString
      var id = startId
      for (seg <- 1 to nSegs) {
        val lines = (1 to perSeg).map { _ =>
          id += 1
          Fixtures.env("employees", "c", "null",
            Fixtures.emp(id = id, num = s"EMP$id"), Fixtures.T0 + id * 100L)
        }
        Ledger.writeSegment(ledger, "hrdb", "employees", f"$seg%06d.jsonl", lines)
      }
      ledger
    }

    def timeMs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e6)
    }

    // one batch worth of wire rows, read through the real source (batch mode)
    def wireFor(ledger: String): DataFrame =
      spark.read.format("graft-changelog").option("path", ledger)
        .option("minBatchPartitions",
          spark.sparkContext.defaultParallelism.toString)
        .load()

    // warmup: run the full thing twice so codegen caches and JIT are hot
    for (w <- 1 to 2) {
      val ledger = mkLedger(4, w * 1000000)
      val wire = wireFor(ledger)
      wire.persist(); wire.count()
      val events = graft.streaming.Pipeline.transform(wire, Some(Seq("employees")))
      val deduped = Validate.split(events).valid.dropDuplicates("eventId")
      deduped.persist(); deduped.count()
      val root = Files.createTempDirectory("sink").toString
      graft.streaming.Pipeline.storeThenPublish(deduped, 0L, root, directWrite = true)
      deduped.unpersist(); wire.unpersist()
    }

    // measured: a 20k-event batch, stage by stage
    for (round <- 1 to 3) {
      val ledger = mkLedger(4, 3000000 + round * 1000000)
      val wire = wireFor(ledger)
      val (_, tPersist) = timeMs { wire.persist(); wire.count() }
      val (events, tBuild) = timeMs {
        graft.streaming.Pipeline.transform(wire, Some(Seq("employees")))
      }
      val (deduped, tBuild2) = timeMs {
        Validate.split(events).valid.dropDuplicates("eventId")
      }
      val (_, tPlan) = timeMs { deduped.queryExecution.executedPlan }
      val (_, tCore) = timeMs { deduped.persist(); deduped.count() }
      val root = Files.createTempDirectory("sink").toString
      val (_, tSink) = timeMs {
        graft.streaming.Pipeline.storeThenPublish(deduped, 0L, root, directWrite = true)
      }
      deduped.unpersist(); wire.unpersist()
      // fused path (what Pipeline.run actually does for single-table
      // batches): no intermediate persist, one job end-to-end
      val wire2 = wireFor(mkLedger(4, 6000000 + round * 1000000))
      val root2 = Files.createTempDirectory("sink").toString
      val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long)]()
      val sl = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = e.stageInfo
          val wall = (for {s <- i.submissionTime; c <- i.completionTime}
            yield c - s).getOrElse(-1L)
          stages += ((i.stageId, i.numTasks, wall,
            i.taskMetrics.executorRunTime))
        }
      }
      spark.sparkContext.addSparkListener(sl)
      val cm = org.apache.spark.metrics.source.CodegenMetrics
      val (c0, ct0) = (cm.METRIC_SOURCE_CODE_SIZE.getCount,
        cm.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
      val (_, tFused) = timeMs {
        val ev = graft.streaming.Pipeline.transform(wire2, Some(Seq("employees")))
        val dd = Validate.split(ev).valid.dropDuplicates("eventId")
        graft.streaming.Pipeline.storeThenPublish(dd, 0L, root2, directWrite = true)
      }
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(sl)
      val nCompile = cm.METRIC_SOURCE_CODE_SIZE.getCount - c0
      val stageStr = stages.sortBy(_._1).map { case (id, n, wall, run) =>
        f"s$id(n=$n wall=${wall}ms run=${run}ms)" }.mkString(" ")
      println(f"BATCHCOST round=$round persist=$tPersist%.0fms build=${tBuild + tBuild2}%.0fms plan=$tPlan%.0fms core=$tCore%.0fms sink=$tSink%.0fms staged=${tPersist + tBuild + tBuild2 + tPlan + tCore + tSink}%.0fms fusedTotal=$tFused%.0fms codegenCompiles=$nCompile stageWallSum=${stages.map(_._3).sum}ms $stageStr")
    }
    spark.stop()
  }
}
