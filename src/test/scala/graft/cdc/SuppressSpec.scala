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

  test("event-time TTL evicts idle keys: the next row re-emits instead of " +
      "suppressing against evicted state") {
    import spark.implicits._
    def t(hours: Long) = new java.sql.Timestamp(1718000000000L + hours * 3600000L)
    val streamDir = Files.createTempDirectory("suppress_ttl").toString
    def writeFile(rows: Seq[(Long, java.sql.Timestamp, Long, Option[String])],
                  name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("suppress_ttl_tmp").toString
      rows.toDF("k", "ts", "id", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("part-")).head
      val dst = Paths.get(streamDir, name)
      Files.copy(Paths.get(part), dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
      ()
    }
    // batch 0: key 1 emits "a" (timeout armed at t+1h).
    // batch 1: key 2 at t+10h advances the watermark far past the TTL.
    // batch 2: key 3 only — key 1 has no data, so its timed-out state is
    //          EVICTED here (a key with data never fires its timeout).
    // batch 3: key 1 again with the SAME value "a" — with NoTimeout this
    //          row is provably suppressed (asserted below); with the TTL
    //          it re-emits because the state store no longer knows key 1.
    writeFile(Seq((1L, t(0), 1L, Some("a"))), "0000.parquet", 1718000000000L)
    writeFile(Seq((2L, t(10), 2L, Some("x"))), "0001.parquet", 1718000100000L)
    writeFile(Seq((3L, t(11), 3L, Some("y"))), "0002.parquet", 1718000200000L)
    writeFile(Seq((1L, t(12), 4L, Some("a"))), "0003.parquet", 1718000300000L)
    val sch = Seq((1L, t(0), 1L, Option("a"))).toDF("k", "ts", "id", "v").schema

    def run(ttl: Option[java.time.Duration]): Set[Long] = {
      val src = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(streamDir)
        .withWatermark("ts", "1 minute")
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = Suppress.suppressUnchangedStream(src, "k", "ts", "id", Seq("v"),
          stateTtl = ttl)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = df.select($"id").collect().map(_.getLong(0))
          out.synchronized { out ++= ids }
          ()
        }
        .start()
      q.awaitTermination(120000)
      out.toSet
    }
    // no TTL: key 1's second "a" suppresses against state held forever
    assert(run(None) == Set(1L, 2L, 3L))
    // 1h TTL: state evicted during batch 2, so id=4 re-emits — the
    // documented at-least-once re-emission, never a lost change
    assert(run(Some(java.time.Duration.ofHours(1))) == Set(1L, 2L, 3L, 4L))
  }
}
