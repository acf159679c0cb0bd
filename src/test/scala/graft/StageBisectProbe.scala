package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cdc.{ChangeStream, Fixtures, Rules, Schemas, Validate}
import graft.sources.Ledger

/** Bisects the per-task cost of the streaming batch's first stage:
  * scan → +parse → +rules → +validate → +dedup, each timed warm.
  */
object StageBisectProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
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
    def wireFor(ledger: String): DataFrame =
      spark.read.format("graft-changelog").option("path", ledger)
        .option("minBatchPartitions",
          spark.sparkContext.defaultParallelism.toString)
        .load()
    def timeMs[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }

    val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
      "scan" -> (w => w),
      "parse" -> (w => ChangeStream.deserialize(
        w.filter(col("table") === "employees"), Schemas.tables("employees"))),
      "rules" -> (w => Rules.applyAll(ChangeStream.deserialize(
        w.filter(col("table") === "employees"), Schemas.tables("employees")), "employees")),
      "valid" -> (w => Validate.split(Rules.applyAll(ChangeStream.deserialize(
        w.filter(col("table") === "employees"), Schemas.tables("employees")), "employees")).valid),
      "dedup" -> (w => Validate.split(Rules.applyAll(ChangeStream.deserialize(
        w.filter(col("table") === "employees"), Schemas.tables("employees")), "employees")).valid
        .dropDuplicates("eventId"))
    )

    // warmup all variants twice
    for (_ <- 1 to 2; (_, v) <- variants)
      v(wireFor(mkLedger(4, (math.abs(scala.util.hashing.MurmurHash3.stringHash("w")) % 100) * 1000))).count()

    for (round <- 1 to 3) {
      val out = variants.map { case (name, v) =>
        val ledger = mkLedger(4, 10000000 + round * 1000000)
        val ms = timeMs(v(wireFor(ledger)).count())
        f"$name=$ms%.0fms"
      }.mkString(" ")
      println(s"STAGEBISECT round=$round $out")
    }
    spark.stop()
  }
}
