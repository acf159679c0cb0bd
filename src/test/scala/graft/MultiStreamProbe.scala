package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import graft.cdc.Fixtures
import graft.sources.Ledger

/** Horizontal scale-out experiment toward the reference's 100k+ ev/s
  * roadmap tier: N INDEPENDENT pipeline instances (own ledger partition,
  * own sink, own checkpoint — the multi-connector/multi-consumer shape)
  * drain concurrently on one local[32] JVM. Aggregate throughput measures
  * how the single-pipeline cost model (fixed per-batch planning + linear
  * per-event work) overlaps when the per-batch fixed cost is the
  * bottleneck: planning is driver-side single-threaded-ish, so N
  * pipelines hide each other's planning stalls until the cores saturate.
  *
  * Usage: MultiStreamProbe [nPipelines] [segments] [eventsPerSegment] [maxFilesPerTrigger]
  */
object MultiStreamProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4)
    val nSegs = args.lift(1).map(_.toInt).getOrElse(10)
    val perSeg = args.lift(2).map(_.toInt).getOrElse(5000)
    val mft = args.lift(3).map(_.toInt).getOrElse(2)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def writeLedger(pipeline: Int): String = {
      val ledger = Files.createTempDirectory(s"ledger_p$pipeline").toString
      var id = pipeline * 10000000
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

    // warmup: one throwaway pipeline absorbs JVM/codegen startup
    locally {
      val (l, r, c) = (writeLedger(99), Files.createTempDirectory("wsink").toString,
        Files.createTempDirectory("wckpt").toString)
      graft.streaming.Pipeline.run(spark, l, r, c).awaitTermination(600000)
    }

    val setups = (0 until n).map { p =>
      (writeLedger(p), Files.createTempDirectory(s"sink_p$p").toString,
        Files.createTempDirectory(s"ckpt_p$p").toString)
    }
    val t0 = System.nanoTime()
    val queries = setups.map { case (l, r, c) =>
      graft.streaming.Pipeline.run(spark, l, r, c, maxFilesPerTrigger = Some(mft))
    }
    queries.foreach(_.awaitTermination(600000))
    val wallSec = (System.nanoTime() - t0) / 1e9

    val events = n.toLong * nSegs * perSeg
    val stored = setups.map { case (_, r, _) =>
      spark.read.parquet(graft.streaming.Pipeline.storeDir(r)).count()
    }.sum
    val batchMs = queries.flatMap(_.recentProgress.toSeq)
      .filter(_.numInputRows > 0)
      .map(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong)
        .getOrElse(p.durationMs.values().asScala.map(_.toLong).sum))
      .sorted
    val p95 = if (batchMs.nonEmpty)
      batchMs(math.min(batchMs.size - 1, (batchMs.size * 95) / 100)) else 0L
    println(f"MULTISTREAM n=$n wall=$wallSec%.1fs aggregate=${events / wallSec}%.0f ev/s " +
      f"p95BatchMs=$p95 batches=${batchMs.size} stored=$stored events=$events")
    spark.stop()
  }
}
