package graft.cdc

import java.nio.file.Files
import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Ledger

class ExternalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val payrollMsg =
    s"""{"employee_id":2,"old_salary":95000.00,"new_salary":101000.00,
       |"reason":"External payroll sync","effective_date":"2024-07-01",
       |"event_time":"2024-06-10T07:00:00Z","source_system":"payroll-system"}"""
      .stripMargin.replaceAll("\n", "")

  test("external payroll events convert to SalaryAdjusted and union with CDC stream") {
    val ledger = Files.createTempDirectory("ledger").toString
    Ledger.writeCrudScenario(ledger)
    Ledger.writeSegment(ledger, "external", "payroll", "000001.jsonl", Seq(payrollMsg))
    val out = mutable.ArrayBuffer.empty[(String, String, String)]
    val q = spark.readStream.format("graft-changelog").option("path", ledger)
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .foreachBatch { (wire: org.apache.spark.sql.DataFrame, _: Long) =>
        wire.persist()
        try {
          val cdc = graft.streaming.Pipeline.transform(
            wire.filter(col("db") === "hrdb"))
          val ext = External.payrollToDomainEvents(wire)
          val all = External.unionStreams(Seq(cdc, ext))
          out.synchronized {
            out ++= all.select("eventType", "aggregateId", "metadata.source")
              .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
          }
        } finally { wire.unpersist(); () }
        ()
      }
      .start()
    q.awaitTermination(120000)
    // CDC: Hired, DataUpdated, SalaryAdjusted, LeaveRequested + 1 external
    assert(out.size == 5)
    val external = out.filter(_._3 == "payroll-system")
    assert(external == Seq(("SalaryAdjusted", "2", "payroll-system")))
    assert(out.count(_._1 == "SalaryAdjusted") == 2) // internal + external
  }

  test("malformed external messages are dropped, not crashing the stream") {
    import spark.implicits._
    val wire = Seq(
      ("external", "payroll", payrollMsg),
      ("external", "payroll", "{not json"),
      ("external", "payroll", """{"employee_id":null,"new_salary":1}"""))
      .toDF("db", "table", "value")
    assert(External.payrollToDomainEvents(wire).count() == 1)
  }
}

class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("INSERT IGNORE drops existing keys and in-batch duplicates") {
    import spark.implicits._
    val existing = Fixtures.seedPositions(spark)
    val incoming = Seq(
      ("IC1", "Junior Engineer v2", 1L), // key exists -> ignored
      ("IC9", "Distinguished", 2L),
      ("IC9", "Distinguished dup", 3L)) // in-batch dup -> first wins
      .toDF("id", "title", "seq")
    val inserted = Ingest.insertIgnore(existing, incoming, Seq("id"), "seq")
      .collect()
    assert(inserted.length == 1)
    assert(inserted.head.getAs[String]("id") == "IC9")
    assert(inserted.head.getAs[String]("title") == "Distinguished")
  }

  test("autoIncrement continues from the existing max") {
    import spark.implicits._
    val incoming = Seq("EMP010", "EMP011").toDF("employee_number")
    val withIds = Ingest.autoIncrement(incoming, "id", startFrom = 3, "employee_number")
      .collect().map(r => r.getAs[String]("employee_number") -> r.getAs[Int]("id")).toMap
    assert(withIds == Map("EMP010" -> 4, "EMP011" -> 5))
    val sparse = Ingest.autoIncrementSparse(incoming, "id", startFrom = 3)
      .select("id").collect().map(_.getLong(0))
    assert(sparse.distinct.length == 2 && sparse.forall(_ > 3))
  }

  test("autoIncrement assigns a dense order-true sequence across many " +
      "partitions without a data-sized global window") {
    import spark.implicits._
    val n = 5000
    val incoming = spark.range(0, n).select(
      concat(lit("E"), lpad($"id".cast("string"), 6, "0")).as("employee_number"))
      .repartition(8)
    val ids = Ingest.autoIncrement(incoming, "id", startFrom = 100,
      "employee_number")
      .orderBy($"employee_number")
      .collect().map(_.getAs[Int]("id")).toSeq
    // dense, contiguous, and in the order column's global order
    assert(ids == (101 to 100 + n).toSeq)
    // plan: every window over the DATA is partitioned (by _pid); the only
    // unpartitioned window is the prefix over per-partition COUNTS (one
    // row per partition — its child is an Aggregate)
    val plan = Ingest.autoIncrement(incoming, "id", startFrom = 100,
      "employee_number").queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate}
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      if (w.partitionSpec.isEmpty) {
        val aggBelow = w.child.collectFirst { case a: Aggregate => a }
        assert(aggBelow.isDefined,
          s"unpartitioned window must sit on the per-partition counts, got:\n$w")
      }
    }
  }

  test("upsert: ON UPDATE CURRENT_TIMESTAMP only on changed rows; inserts get both defaults") {
    import spark.implicits._
    val t0 = Fixtures.T0
    val t1 = Fixtures.T0 + 3600000L
    val existing = Seq(
      (1, "EMP001", "120000.00", t0),
      (2, "EMP002", "95000.00", t0))
      .toDF("id", "employee_number", "salary", "ms")
      .select($"id", $"employee_number", $"salary".cast("decimal(12,2)").as("salary"),
        timestamp_millis($"ms").as("created_at"), timestamp_millis($"ms").as("updated_at"))
    val incoming = Seq(
      ("EMP001", "120000.00"), // unchanged
      ("EMP002", "99000.00"),  // salary changed
      ("EMP004", "80000.00"))  // new
      .toDF("employee_number", "salary")
      .select($"employee_number", $"salary".cast("decimal(12,2)").as("salary"))
    val merged = Ingest.upsert(existing, incoming, Seq("employee_number"),
      compareCols = Seq("salary"), nowMs = t1)
      .collect().map(r => r.getAs[String]("employee_number") -> r).toMap
    assert(merged.size == 3)
    assert(merged("EMP001").getAs[java.sql.Timestamp]("updated_at").getTime == t0)
    assert(merged("EMP002").getAs[java.sql.Timestamp]("updated_at").getTime == t1)
    assert(merged("EMP002").getAs[java.sql.Timestamp]("created_at").getTime == t0)
    assert(merged("EMP002").getAs[java.math.BigDecimal]("salary").toPlainString == "99000.00")
    assert(merged("EMP004").getAs[java.sql.Timestamp]("created_at").getTime == t1)
    assert(merged("EMP004").getAs[java.sql.Timestamp]("updated_at").getTime == t1)
  }

  test("upsert: existing rows absent from the batch are untouched (incremental merge)") {
    import spark.implicits._
    val t0 = Fixtures.T0
    val t1 = Fixtures.T0 + 3600000L
    val existing = Seq(
      (1, "EMP001", "120000.00", t0),
      (2, "EMP002", "95000.00", t0))
      .toDF("id", "employee_number", "salary", "ms")
      .select($"id", $"employee_number", $"salary".cast("decimal(12,2)").as("salary"),
        timestamp_millis($"ms").as("created_at"), timestamp_millis($"ms").as("updated_at"))
    // Incremental batch touches only EMP002; EMP001 must survive bit-for-bit.
    val incoming = Seq(("EMP002", "99000.00"))
      .toDF("employee_number", "salary")
      .select($"employee_number", $"salary".cast("decimal(12,2)").as("salary"))
    val merged = Ingest.upsert(existing, incoming, Seq("employee_number"),
      compareCols = Seq("salary"), nowMs = t1)
      .collect().map(r => r.getAs[String]("employee_number") -> r).toMap
    assert(merged.size == 2)
    assert(merged("EMP001").getAs[java.sql.Timestamp]("updated_at").getTime == t0)
    assert(merged("EMP001").getAs[java.math.BigDecimal]("salary").toPlainString == "120000.00")
    assert(merged("EMP002").getAs[java.sql.Timestamp]("updated_at").getTime == t1)
  }

  test("upsert: incoming NULL overwrites (ON DUPLICATE KEY UPDATE semantics)") {
    import spark.implicits._
    val t0 = Fixtures.T0
    val t1 = Fixtures.T0 + 3600000L
    val existing = Seq((1, "EMP001", "120000.00", t0))
      .toDF("id", "employee_number", "salary", "ms")
      .select($"id", $"employee_number", $"salary".cast("decimal(12,2)").as("salary"),
        timestamp_millis($"ms").as("created_at"), timestamp_millis($"ms").as("updated_at"))
    val incoming = Seq("EMP001").toDF("employee_number")
      .select($"employee_number", lit(null).cast("decimal(12,2)").as("salary"))
    val merged = Ingest.upsert(existing, incoming, Seq("employee_number"),
      compareCols = Seq("salary"), nowMs = t1).collect()
    assert(merged.length == 1)
    assert(merged.head.getAs[java.math.BigDecimal]("salary") == null)
    assert(merged.head.getAs[java.sql.Timestamp]("updated_at").getTime == t1)
  }
}
