package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}
import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.cdc.{ChangeStream, Fixtures, Schemas}

object Ledger {
  /** Write envelope JSON lines as one ledger segment file. */
  def writeSegment(root: String, db: String, table: String, name: String,
                   lines: Seq[String]): Unit = {
    val dir = Paths.get(root, db, table)
    Files.createDirectories(dir)
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  /** The test-cdc.sh CRUD scenario as a three-table ledger. */
  def writeCrudScenario(root: String): Unit = {
    val sc =
      """{"id":1,"employee_id":999,"old_salary":90000.00,"new_salary":95000.00,"reason":"Performance review","effective_date":"2024-06-10","approved_by":null,"created_at":"2024-06-10T05:35:20Z"}"""
    val lr =
      """{"id":1,"employee_id":999,"leave_type":"vacation","start_date":"2024-06-17","end_date":"2024-06-24","status":"pending","approved_by":null,"reason":"Summer vacation","created_at":"2024-06-10T05:36:20Z","updated_at":"2024-06-10T05:36:20Z"}"""
    writeSegment(root, "hrdb", "employees", "000001.jsonl", Seq(
      Fixtures.env("employees", "c", "null", Fixtures.emp(), Fixtures.T0 + 60000),
      Fixtures.env("employees", "u", Fixtures.emp(),
        Fixtures.emp(salary = "95000.00"), Fixtures.T0 + 120000),
      Fixtures.env("employees", "d",
        Fixtures.emp(salary = "95000.00"), "null", Fixtures.T0 + 420000)))
    writeSegment(root, "hrdb", "salary_changes", "000001.jsonl", Seq(
      Fixtures.env("salary_changes", "c", "null", sc, Fixtures.T0 + 180000),
      Fixtures.env("salary_changes", "d", sc, "null", Fixtures.T0 + 360000)))
    writeSegment(root, "hrdb", "leave_requests", "000001.jsonl", Seq(
      Fixtures.env("leave_requests", "c", "null", lr, Fixtures.T0 + 240000),
      Fixtures.env("leave_requests", "d", lr, "null", Fixtures.T0 + 300000)))
  }
}

class ChangeLogSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow streaming run reproduces the test-cdc.sh ledger") {
    val root = tmp("ledger")
    Ledger.writeCrudScenario(root)
    val rows = mutable.ArrayBuffer.empty[(String, String, Long)]
    val q = spark.readStream.format("graft-changelog").option("path", root)
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp("ckpt"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized {
          rows ++= df.select("table", "op", "ts_ms").collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        }
        ()
      }
      .start()
    q.awaitTermination(60000)
    val ledger = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.size).toMap
    assert(ledger == Map(
      ("employees", "c") -> 1, ("employees", "u") -> 1, ("employees", "d") -> 1,
      ("salary_changes", "c") -> 1, ("salary_changes", "d") -> 1,
      ("leave_requests", "c") -> 1, ("leave_requests", "d") -> 1))
    // subjects follow the shipped config scheme
    assert(rows.map(_._3).forall(_ >= Fixtures.T0))
  }

  test("table include list prunes other tables at the source") {
    val root = tmp("ledger")
    Ledger.writeCrudScenario(root)
    val batch = spark.read.format("graft-changelog")
      .option("path", root).option("tables", "employees").load()
    assert(batch.select("table").distinct().collect().map(_.getString(0)).toSeq
      == Seq("employees"))
    // one segment file => one planned partition
    assert(batch.rdd.getNumPartitions == 1)
  }

  test("db/table equality filters push down and prune directories") {
    val root = tmp("ledger")
    Ledger.writeCrudScenario(root)
    val all = spark.read.format("graft-changelog").option("path", root).load()
    assert(all.rdd.getNumPartitions == 3) // three tables, one segment each
    val filtered = all.filter(col("table") === "employees" && col("op") === "c")
    assert(filtered.rdd.getNumPartitions == 1, "directory pruning via pushdown")
    assert(filtered.count() == 1)
    val scanDesc = filtered.queryExecution.executedPlan.toString
    assert(scanDesc.contains("tables=[employees]"), scanDesc)
  }

  test("maxFilesPerTrigger paces micro-batches; restart resumes from offset") {
    val root = tmp("ledger")
    val ckpt = tmp("ckpt")
    Ledger.writeCrudScenario(root) // 3 segment files
    val seen = mutable.ArrayBuffer.empty[(Long, String)] // (batchId, value)
    def run(): Unit = {
      val q = spark.readStream.format("graft-changelog")
        .option("path", root).option("maxFilesPerTrigger", "1")
        .load()
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          seen.synchronized {
            seen ++= df.select("value").collect().map(r => (id, r.getString(0)))
          }
          ()
        }
        .start()
      q.awaitTermination(60000)
    }
    run()
    val firstBatches = seen.map(_._1).distinct.size
    assert(firstBatches == 3, s"expected 3 single-file batches, got $firstBatches")
    assert(seen.size == 7)

    // Append a new segment and restart on the same checkpoint: only the new
    // file is processed (offset recovery, no loss, no reprocessing).
    Ledger.writeSegment(root, "hrdb", "employees", "000002.jsonl", Seq(
      Fixtures.env("employees", "c", "null",
        Fixtures.emp(id = 1000, num = "EMP1000"), Fixtures.T0 + 500000)))
    run()
    assert(seen.size == 8, "restart must process exactly the new segment")
    assert(seen.last._2.contains("EMP1000"))
  }

  test("fat segments split into byte-range partitions with no loss or duplication") {
    val root = tmp("ledger")
    val lines = (1 to 5000).map(i =>
      Fixtures.env("employees", "c", "null", Fixtures.emp(id = i, num = s"EMP$i"),
        Fixtures.T0 + i))
    Ledger.writeSegment(root, "hrdb", "employees", "000001.jsonl", lines)
    val whole = spark.read.format("graft-changelog").option("path", root).load()
    val split = spark.read.format("graft-changelog").option("path", root)
      .option("maxPartitionBytes", "10000") // ~400-byte lines -> many splits
      .load()
    assert(split.rdd.getNumPartitions > 10,
      s"expected many splits, got ${split.rdd.getNumPartitions}")
    assert(whole.rdd.getNumPartitions == 1)
    assert(split.count() == 5000)
    // exact multiset equality of the wire rows
    assert(split.exceptAll(whole).isEmpty && whole.exceptAll(split).isEmpty)
  }

  test("split boundary exactly at a line start: no loss, no duplication") {
    // 10 lines of exactly 100 bytes (99 json chars + newline); 1000-byte
    // file with maxPartitionBytes=200 -> 5 splits whose starts (0, 200,
    // 400, ...) all land EXACTLY on line starts — the case where the
    // previous split must read one line past its end and the next split
    // must discard exactly that line.
    val root = tmp("ledger")
    val lines = (0 until 10).map { i =>
      val pad = "x" * (99 - s"""{"id":$i,"p":""}""".length)
      s"""{"id":$i,"p":"$pad"}"""
    }
    lines.foreach(l => assert(l.getBytes("UTF-8").length == 99))
    Ledger.writeSegment(root, "hrdb", "employees", "000001.jsonl", lines)
    val split = spark.read.format("graft-changelog").option("path", root)
      .option("maxPartitionBytes", "200").load()
    assert(split.rdd.getNumPartitions == 5)
    val vals = split.select("value").collect().map(_.getString(0)).sorted.toSeq
    assert(vals == lines.sorted, s"got ${vals.size} rows")
  }

  test("offset JSON round-trips hostile directory names (quotes, backslashes)") {
    val tm = scala.collection.immutable.TreeMap(
      """hrdb/emp"loyees""" -> 3,
      """hr\db/t1""" -> 1,
      "hrdb/employees" -> 7)
    val off = ChangeLogOffset(tm)
    assert(ChangeLogOffset.parse(off.json()) == off,
      s"offset must survive checkpoint serialization: ${off.json()}")
  }

  test("wire rows deserialize to typed envelopes downstream") {
    val root = tmp("ledger")
    Ledger.writeCrudScenario(root)
    val wire = spark.read.format("graft-changelog").option("path", root)
      .load().filter(col("table") === "employees")
    val typed = ChangeStream.deserialize(wire, Schemas.employees)
    val created = typed.filter(col("op") === "c").select("after.salary", "after.employee_number")
      .collect().head
    assert(created.getDecimal(0).toPlainString == "90000.00")
    assert(created.getString(1) == "EMP999")
  }
}
