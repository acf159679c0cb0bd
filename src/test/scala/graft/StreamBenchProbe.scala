package graft
import java.nio.file.Files
import scala.jdk.CollectionConverters._
import graft.cdc.Fixtures
import graft.sources.Ledger
object StreamBenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ledger = Files.createTempDirectory("ledger").toString
    val nSegs = 20; val perSeg = 5000
    var id = 0
    for (seg <- 1 to nSegs) {
      val lines = (1 to perSeg).map { _ =>
        id += 1
        val op = id % 10 match {
          case 0 => "d"; case 1 | 2 => "u"; case _ => "c"
        }
        val ts = Fixtures.T0 + id * 100L
        op match {
          case "c" => Fixtures.env("employees", "c", "null", Fixtures.emp(id = id, num = s"EMP$id"), ts)
          case "u" => Fixtures.env("employees", "u", Fixtures.emp(id = id, num = s"EMP$id"),
            Fixtures.emp(id = id, num = s"EMP$id", salary = "95000.00"), ts)
          case "d" => Fixtures.env("employees", "d", Fixtures.emp(id = id, num = s"EMP$id"), "null", ts)
        }
      }
      Ledger.writeSegment(ledger, "hrdb", "employees", f"$seg%06d.jsonl", lines)
    }
    val (root, ckpt) = (Files.createTempDirectory("sink").toString,
      Files.createTempDirectory("ckpt").toString)
    // cold run: first 20 segments (JVM + codegen warmup included)
    val t0 = System.nanoTime()
    val q = graft.streaming.Pipeline.run(spark, ledger, root, ckpt,
      maxFilesPerTrigger = sys.env.get("MFT").map(_.toInt))
    q.awaitTermination(600000)
    val coldSec = (System.nanoTime() - t0) / 1e9
    // steady state: 20 MORE segments through the same checkpoint, warm JVM
    for (seg <- nSegs + 1 to 2 * nSegs) {
      val lines = (1 to perSeg).map { _ =>
        id += 1
        Fixtures.env("employees", "c", "null", Fixtures.emp(id = id, num = s"EMP$id"), Fixtures.T0 + id * 100L)
      }
      Ledger.writeSegment(ledger, "hrdb", "employees", f"$seg%06d.jsonl", lines)
    }
    val t1 = System.nanoTime()
    val q2 = graft.streaming.Pipeline.run(spark, ledger, root, ckpt,
      maxFilesPerTrigger = sys.env.get("MFT").map(_.toInt))
    q2.awaitTermination(600000)
    val warmSec = (System.nanoTime() - t1) / 1e9
    // third pass: ONE long-lived query drains 20 MORE segments in admission-
    // controlled batches; per-batch progress gives the sustained rate AND the
    // batch-latency distribution a production query sees (no per-query
    // startup in the denominator). Read from the query's recentProgress —
    // Pipeline.run executes on a cloned session, so a listener on the
    // caller's StreamingQueryManager would never fire.
    for (seg <- 2 * nSegs + 1 to 3 * nSegs) {
      val lines = (1 to perSeg).map { _ =>
        id += 1
        Fixtures.env("employees", "c", "null", Fixtures.emp(id = id, num = s"EMP$id"), Fixtures.T0 + id * 100L)
      }
      Ledger.writeSegment(ledger, "hrdb", "employees", f"$seg%06d.jsonl", lines)
    }
    val t2 = System.nanoTime()
    val q3 = graft.streaming.Pipeline.run(spark, ledger, root, ckpt,
      maxFilesPerTrigger = Some(sys.env.get("MFT").map(_.toInt).getOrElse(4)))
    q3.awaitTermination(600000)
    val steadySec = (System.nanoTime() - t2) / 1e9
    val progress = q3.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => (p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.toLong)
          .getOrElse(p.durationMs.values().asScala.map(_.toLong).sum)))
    val events = nSegs * perSeg
    val stored = spark.read.parquet(
      graft.streaming.Pipeline.storeDir(root)).count()
    val measured = progress.toSeq.drop(1) // first batch pays residual warmup
    // ground-truth events per batch = pass-3 event count / batch count:
    // the DSv2 progress's numInputRows over-reports (observed 2x vs the
    // rows actually stored), so rates are computed from stored rows
    val realBatchRows =
      if (progress.nonEmpty) events.toDouble / progress.size else 0.0
    val perBatch = measured.map { case (_, ms) => realBatchRows / (ms / 1000.0) }
    val sustained = if (perBatch.nonEmpty) perBatch.sorted.apply(perBatch.size / 2) else 0.0
    val lat = measured.map(_._2).sorted
    val p95 = if (lat.nonEmpty) lat(math.min(lat.size - 1, (lat.size * 95) / 100)) else 0L
    println(f"STREAMBENCH cold=$coldSec%.1fs (${events / coldSec}%.0f ev/s) warm=$warmSec%.1fs (${events / warmSec}%.0f ev/s) steady=$steadySec%.1fs (${events / steadySec}%.0f ev/s) sustainedPerBatch=$sustained%.0f ev/s p95BatchMs=$p95 realBatchRows=$realBatchRows%.0f batches=${progress.size} stored=$stored")
    spark.stop()
  }
}
