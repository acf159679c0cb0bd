package graft.cdc

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SuppressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new java.sql.Timestamp(1718000000000L + s * 1000L)

  // (key, ts, id, value) — runs of equal values, a cross-batch-boundary
  // run, and null-as-a-value transitions
  private val fileA = Seq(
    (1L, ts(1), 101L, Some("a")), (1L, ts(2), 102L, Some("a")),
    (1L, ts(3), 103L, Some("b")),
    (2L, ts(1), 201L, Some("a")))
  private val fileB = Seq(
    (1L, ts(4), 104L, Some("b")), (1L, ts(5), 105L, Some("c")),
    (2L, ts(2), 202L, Some("a")), (2L, ts(3), 203L, Option.empty[String]),
    (2L, ts(4), 204L, Option.empty[String]), (2L, ts(5), 205L, Some("a")))
  private val expectedIds = Set(101L, 103L, 105L, 201L, 203L, 205L)

  test("batch: keeps first row and value transitions only, null-safely") {
    import spark.implicits._
    val df = (fileA ++ fileB).toDF("k", "ts", "id", "v")
    val got = Suppress.suppressUnchanged(df, "k", "ts", "id", Seq("v"))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == expectedIds)
  }

  test("multi-column tuples: any tracked column changing emits") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(1), 1L, "x", 10L), (1L, ts(2), 2L, "x", 10L), // suppressed
      (1L, ts(3), 3L, "x", 20L), // second column moved
      (1L, ts(4), 4L, "y", 20L)) // first column moved
      .toDF("k", "ts", "id", "a", "b")
    val got = Suppress.suppressUnchanged(df, "k", "ts", "id", Seq("a", "b"))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L, 3L, 4L))
  }

  test("streaming flatMapGroupsWithState == batch form, state crossing batches") {
    import spark.implicits._
    val streamDir = Files.createTempDirectory("suppress_stream").toString
    def writeFile(rows: Seq[(Long, java.sql.Timestamp, Long, Option[String])],
                  name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("suppress_tmp").toString
      rows.toDF("k", "ts", "id", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("part-")).head
      val dst = Paths.get(streamDir, name)
      Files.copy(Paths.get(part), dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
      ()
    }
    writeFile(fileA, "0000.parquet", 1718000000000L)
    writeFile(fileB, "0001.parquet", 1718000100000L)
    val sch = fileA.toDF("k", "ts", "id", "v").schema
    val src = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = Suppress.suppressUnchangedStream(src, "k", "ts", "id", Seq("v"))
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.select($"id").collect().map(_.getLong(0))
        out.synchronized { out ++= ids; batches += ids.length }
        ()
      }
      .start()
    q.awaitTermination(120000)
    // identical rows to the batch form; the key-1 "b" and key-2 "a" runs
    // straddle the file boundary, so suppression there PROVES the state
    // store carried the last tuple across micro-batches
    assert(out.toSet == expectedIds)
    assert(batches.count(_ > 0) >= 2, s"expected 2+ micro-batches, got $batches")
  }
}
