package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.cdc.{ChangeStream, Dedup, Fixtures, Rules, Schemas}
import graft.sources.Ledger

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("full pipeline: ledger -> rules -> store-then-publish, batch-idempotent") {
    val (ledger, store, publish, ckpt) =
      (tmp("ledger"), tmp("store"), tmp("publish"), tmp("ckpt"))
    Ledger.writeCrudScenario(ledger)
    val q = Pipeline.run(spark, ledger, store, publish, ckpt)
    q.awaitTermination(120000)
    val stored = Pipeline.readEventStore(spark, store)
    // crud scenario fires: EmployeeHired, EmployeeDataUpdated (salary-only
    // update), SalaryAdjusted, LeaveRequested = 4 domain events
    assert(stored.count() == 4)
    assert(stored.select("eventType").distinct().count() == 4)
    val published = spark.read.parquet(publish)
    assert(published.select("eventId").distinct().count() == 4)
    // store is month-partitioned under the hood
    assert(new java.io.File(store, "event_month=202406").exists())
  }

  test("crash between store and publish: restart yields no loss and no dups") {
    val (ledger, store, publish, ckpt) =
      (tmp("ledger"), tmp("store"), tmp("publish"), tmp("ckpt"))
    Ledger.writeCrudScenario(ledger)
    val boom = new AtomicInteger(0)
    // first attempt at any batch: store committed, then crash before publish
    val q1 = Pipeline.run(spark, ledger, store, publish, ckpt,
      failpoint = _ => if (boom.getAndIncrement() == 0)
        throw new RuntimeException("simulated crash between store and publish"))
    intercept[Exception] { q1.awaitTermination(120000) }
    // store has the batch, publish does not — the ordering invariant
    assert(spark.read.parquet(store).count() > 0)
    val publishFiles = Option(new java.io.File(publish).listFiles()).getOrElse(Array.empty)
    assert(publishFiles.forall(!_.getName.startsWith("subject=")),
      "nothing may be published before the crash point")

    // restart on the same checkpoint: the batch replays, overwrites its own
    // store partitions (no dup) and publishes
    val q2 = Pipeline.run(spark, ledger, store, publish, ckpt)
    q2.awaitTermination(120000)
    val stored = Pipeline.readEventStore(spark, store)
    assert(stored.count() == 4, "replay must not duplicate store rows")
    assert(stored.select("eventId").distinct().count() == 4)
    val published = spark.read.parquet(publish)
    assert(published.count() == 4, "publish completes on replay")
    assert(published.select("eventId").distinct().count() == 4)
  }

  test("streaming dedup: dropDuplicatesWithinWatermark suppresses cross-batch duplicate") {
    val ledger = tmp("ledger")
    // same hired envelope in two segments -> same deterministic eventId,
    // arriving in two different micro-batches (maxFilesPerTrigger=1)
    val hired = Fixtures.env("employees", "c", "null", Fixtures.emp(), Fixtures.T0)
    val later = Fixtures.env("employees", "c", "null",
      Fixtures.emp(id = 1000, num = "EMP1000"), Fixtures.T0 + 30000)
    Ledger.writeSegment(ledger, "hrdb", "employees", "000001.jsonl", Seq(hired))
    Ledger.writeSegment(ledger, "hrdb", "employees", "000002.jsonl", Seq(hired, later))
    val rows = mutable.ArrayBuffer.empty[String]
    val wire = spark.readStream.format("graft-changelog")
      .option("path", ledger).option("maxFilesPerTrigger", "1").load()
    val events = Rules.applyAll(
      ChangeStream.deserialize(wire.filter(col("table") === "employees"),
        Schemas.employees), "employees")
    val deduped = Dedup.withinWatermark(events, Seq("eventId"))
    val q = deduped.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.select("eventId").collect().map(_.getString(0)) }
        ()
      }
      .start()
    q.awaitTermination(120000)
    assert(rows.size == 2, s"duplicate must be suppressed, got ${rows.size} events")
    assert(rows.distinct.size == 2)
  }
}
