package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** key 1: create, update, update          -> 3 versions, last current
    * key 2: create, delete, create (rebirth) -> 2 versions, gap between
    * key 3: create, delete                   -> 1 closed version, nothing
    *                                            current
    */
  private lazy val changes = {
    import spark.implicits._
    Seq(
      (1L, 10L, "c", ts("2024-01-01 00:00:00"), 1.0),
      (1L, 11L, "u", ts("2024-01-02 00:00:00"), 2.0),
      (1L, 12L, "u", ts("2024-01-03 00:00:00"), 3.0),
      (2L, 20L, "c", ts("2024-01-01 00:00:00"), 5.0),
      (2L, 21L, "d", ts("2024-01-02 00:00:00"), 0.0),
      (2L, 22L, "c", ts("2024-01-04 00:00:00"), 7.0),
      (3L, 30L, "c", ts("2024-01-01 00:00:00"), 9.0),
      (3L, 31L, "d", ts("2024-01-05 00:00:00"), 0.0))
      .toDF("k", "id", "op", "ts", "v").repartition(4)
  }

  private lazy val hist = Scd.history(changes, Seq("k"), "ts", "id", "op")

  test("versions carry [from, to) intervals; deletes close but never open") {
    val rows = hist
      .select(col("k"), col("id"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .orderBy(col("k"), col("valid_from"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getTimestamp(3)).map(_.toString), r.getBoolean(4)))
      .toList
    assert(rows == List(
      (1L, 10L, Some("2024-01-02 00:00:00.0"), false),
      (1L, 11L, Some("2024-01-03 00:00:00.0"), false),
      (1L, 12L, None, true),
      (2L, 20L, Some("2024-01-02 00:00:00.0"), false), // closed by delete
      (2L, 22L, None, true),                            // rebirth
      (3L, 30L, Some("2024-01-05 00:00:00.0"), false))) // closed, gone
  }

  test("asOf: half-open boundaries — visible at its own instant, replaced " +
      "exactly at the successor's; deleted keys absent; gaps are empty") {
    def at(t: String): Map[Long, Long] =
      Scd.asOf(hist, lit(t).cast("timestamp"))
        .select(col("k"), col("id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // at v2's exact change instant key 1 already shows v2, and key 2 —
    // deleted at that same instant — is already gone (half-open [from,to));
    // key 3 lives until its Jan 5 delete
    assert(at("2024-01-02 00:00:00") == Map(1L -> 11L, 3L -> 30L))
    // key 2 is in its deleted gap on Jan 3, reborn Jan 4
    assert(at("2024-01-03 12:00:00") == Map(1L -> 12L, 3L -> 30L))
    assert(at("2024-01-04 00:00:00") ==
      Map(1L -> 12L, 2L -> 22L, 3L -> 30L))
    // after key 3's delete, only the survivors remain
    assert(at("2024-01-06 00:00:00") == Map(1L -> 12L, 2L -> 22L))
    // before any change: empty world
    assert(at("2023-12-31 00:00:00") == Map.empty)
  }

  test("same-timestamp changes order by the tie column deterministically") {
    import spark.implicits._
    val tied = Seq(
      (7L, 1L, "c", ts("2024-01-01 00:00:00"), 1.0),
      (7L, 2L, "u", ts("2024-01-01 00:00:00"), 2.0))
      .toDF("k", "id", "op", "ts", "v")
    val h = Scd.history(tied, Seq("k"), "ts", "id", "op")
      .orderBy(col("id"))
      .select(col("id"), col("is_current")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toList
    assert(h == List((1L, false), (2L, true)))
  }

  test("plan: one key exchange, a window, no joins") {
    val plan = hist.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("latest: last change wins, deleted keys absent — and it equals " +
      "the history's is_current rows without a window") {
    val got = Scd.latest(changes, Seq("k"), "ts", "id", "op")
      .select(col("k"), col("id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // key 1 -> v12, key 2 -> reborn v22, key 3 -> deleted, absent
    assert(got == Map(1L -> 12L, 2L -> 22L))
    val viaHistory = hist.filter(col("is_current"))
      .select(col("k"), col("id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == viaHistory)
    val plan = Scd.latest(changes, Seq("k"), "ts", "id", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("snapshotDiff: added / removed / changed between two instants") {
    def diff(t1: String, t2: String) =
      Scd.snapshotDiff(hist, Seq("k"), "id",
        lit(t1).cast("timestamp"), lit(t2).cast("timestamp"))
        .collect()
        .map(r => r.getLong(0) ->
          (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    // Jan 1 -> Jan 6: key 1 changed v10->v12, key 2 changed v20->v22
    // (delete + rebirth lands as changed), key 3 removed
    assert(diff("2024-01-01 00:00:00", "2024-01-06 00:00:00") == Map(
      1L -> ("changed", Some(10L), Some(12L)),
      2L -> ("changed", Some(20L), Some(22L)),
      3L -> ("removed", Some(30L), None)))
    // inside key 2's deleted gap -> it shows as added on the far side;
    // key 1 is UNCHANGED (v12 both sides) and produces no row at all
    assert(diff("2024-01-03 00:00:00", "2024-01-06 00:00:00") == Map(
      2L -> ("added", None, Some(22L)),
      3L -> ("removed", Some(30L), None)))
  }

  test("state table maintained per batch: tombstones persist, late older " +
      "changes never resurrect, replay and compaction converge") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scd_state").toString
    val table = "graft_scd_state"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val b0 = Seq(
        (1L, 10L, "c", ts("2024-01-01 00:00:00"), 1.0),
        (2L, 20L, "c", ts("2024-01-01 00:00:00"), 5.0),
        (2L, 21L, "d", ts("2024-01-02 00:00:00"), 0.0))
        .toDF("k", "id", "op", "ts", "v")
      // batch 1 carries an OUT-OF-ORDER update for key 2, older than its
      // tombstone — it must not resurrect the key
      val b1 = Seq(
        (1L, 11L, "u", ts("2024-01-03 00:00:00"), 2.0),
        (2L, 19L, "u", ts("2024-01-01 12:00:00"), 6.0),
        (3L, 30L, "c", ts("2024-01-03 00:00:00"), 9.0))
        .toDF("k", "id", "op", "ts", "v")
      Scd.mergeBatchLatest(b0, Seq("k"), "ts", "id", table, s"$tmp/st", 0L)
      Scd.mergeBatchLatest(b1, Seq("k"), "ts", "id", table, s"$tmp/st", 1L)

      def state() = Scd.stateFromTable(spark, table, Seq("k"), "ts", "id",
        "op").select(col("k"), col("id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = Map(1L -> 11L, 3L -> 30L) // key 2 stays deleted
      assert(state() == expected)
      // equals the one-shot latest over the concatenated stream
      val oneShot = Scd.latest(b0.unionByName(b1), Seq("k"), "ts", "id",
        "op").select(col("k"), col("id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(state() == oneShot)

      // replay batch 1: contents rewritten, state unchanged
      Scd.mergeBatchLatest(b1, Seq("k"), "ts", "id", table, s"$tmp/st", 1L)
      assert(state() == expected)

      // compaction: one consolidated partition, tombstone retained
      Scd.compactState(spark, table, upToBatchId = 1L, Seq("k"), "ts", "id")
      assert(spark.table(table).select(col("_batch_id")).distinct()
        .collect().map(_.getLong(0)).toSet == Set(-2L))
      assert(state() == expected)
      assert(spark.table(table).filter(col("op") === "d").count() == 1,
        "the tombstone must survive compaction")
      // a post-compaction late OLDER change still cannot resurrect
      val b2 = Seq((2L, 18L, "u", ts("2024-01-01 06:00:00"), 7.0))
        .toDF("k", "id", "op", "ts", "v")
      Scd.mergeBatchLatest(b2, Seq("k"), "ts", "id", table, s"$tmp/st", 2L)
      assert(state() == expected)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("a NULL op is a version, not a silently dropped row") {
    import spark.implicits._
    val withNull = Seq(
      (9L, 90L, "c", ts("2024-01-01 00:00:00"), 1.0),
      (9L, 91L, null.asInstanceOf[String], ts("2024-01-02 00:00:00"), 2.0))
      .toDF("k", "id", "op", "ts", "v")
    val h = Scd.history(withNull, Seq("k"), "ts", "id", "op")
      .orderBy(col("id"))
      .select(col("id"), col("is_current")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toList
    assert(h == List((90L, false), (91L, true)))
    val l = Scd.latest(withNull, Seq("k"), "ts", "id", "op")
      .select(col("id")).collect().map(_.getLong(0)).toList
    assert(l == List(91L))
  }

  private def histRows(df: org.apache.spark.sql.DataFrame) = df
    .select(col("k"), col("id"), col("valid_from"), col("valid_to"),
      col("is_current"))
    .orderBy(col("k"), col("valid_from"), col("id"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString,
      Option(r.getTimestamp(3)).map(_.toString), r.getBoolean(4)))
    .toList

  test("history table maintained per batch: out-of-order batches, " +
      "delete-rebirth, replay and compaction all converge to the " +
      "one-shot window") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scd_hist").toString
    val table = "graft_scd_hist_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      // batch 0 is chronologically LATER than batch 1 (out of order):
      // batch 1's changes must split batch 0's stored intervals at read.
      // key 2 is the delete-rebirth: c@1, d@2 land in batch 0; the
      // rebirth c@4 arrives in batch 1 and must NOT reopen [1,2).
      val b0 = Seq(
        (1L, 12L, "u", ts("2024-01-03 00:00:00"), 3.0),
        (2L, 20L, "c", ts("2024-01-01 00:00:00"), 5.0),
        (2L, 21L, "d", ts("2024-01-02 00:00:00"), 0.0),
        (3L, 30L, "c", ts("2024-01-01 00:00:00"), 9.0))
        .toDF("k", "id", "op", "ts", "v")
      val b1 = Seq(
        (1L, 10L, "c", ts("2024-01-01 00:00:00"), 1.0), // late: splits [*,3)
        (1L, 11L, "u", ts("2024-01-02 00:00:00"), 2.0),
        (2L, 22L, "c", ts("2024-01-04 00:00:00"), 7.0)) // rebirth
        .toDF("k", "id", "op", "ts", "v")
      Scd.mergeBatchHistory(b0, Seq("k"), "ts", "id", table, s"$tmp/h", 0L)
      // compact BEFORE the late batch: the stale consolidated intervals
      // must still repair once batch 1's keys arrive
      Scd.compactHistory(spark, table, upToBatchId = 0L, Seq("k"), "ts", "id")
      Scd.mergeBatchHistory(b1, Seq("k"), "ts", "id", table, s"$tmp/h", 1L)

      def viaTable() = histRows(Scd.historyFromTable(spark, table,
        Seq("k"), "ts", "id", "op"))
      val oneShot = histRows(Scd.history(b0.unionByName(b1),
        Seq("k"), "ts", "id", "op"))
      assert(viaTable() == oneShot)
      // key 3 touched by no fresh batch: served from stored intervals
      assert(oneShot.exists(r => r._1 == 3L && r._4.isEmpty && r._5))

      // replay of batch 1 rewrites its partition; contents unchanged
      Scd.mergeBatchHistory(b1, Seq("k"), "ts", "id", table, s"$tmp/h", 1L)
      assert(viaTable() == oneShot)

      // full compaction: one consolidated partition, tombstones retained,
      // reads now window-free and still the one-shot answer
      Scd.compactHistory(spark, table, upToBatchId = 1L, Seq("k"), "ts", "id")
      assert(spark.table(table).select(col("_batch_id")).distinct()
        .collect().map(_.getLong(0)).toSet == Set(-2L))
      assert(spark.table(table).filter(col("op") === "d").count() == 1,
        "the delete tombstone must survive compaction")
      assert(viaTable() == oneShot)

      // a post-compaction late change still re-windows its key's full
      // change set (the consolidated closed interval [1,2) of key 2
      // stays closed; the new change lands in the rebirth era)
      val b2 = Seq((2L, 23L, "u", ts("2024-01-05 00:00:00"), 8.0))
        .toDF("k", "id", "op", "ts", "v")
      Scd.mergeBatchHistory(b2, Seq("k"), "ts", "id", table, s"$tmp/h", 2L)
      val full = histRows(Scd.history(
        b0.unionByName(b1).unionByName(b2), Seq("k"), "ts", "id", "op"))
      assert(viaTable() == full)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("history table through a REAL AvailableNow stream: foreachBatch " +
      "maintenance equals the one-shot history") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("scd_hstream").toString
    val table = "graft_scd_stream_hist"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      def runBatchFile(df: org.apache.spark.sql.DataFrame): Unit = {
        df.coalesce(1).write.mode("append").parquet(s"$tmp/src")
        val q = spark.readStream
          .schema("k LONG, id LONG, op STRING, ts TIMESTAMP, v DOUBLE")
          .parquet(s"$tmp/src")
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            Scd.mergeBatchHistory(b, Seq("k"), "ts", "id", table,
              s"$tmp/h", id)
            ()
          }.start()
        q.awaitTermination()
      }
      val b0 = Seq(
        (1L, 10L, "c", ts("2024-01-01 00:00:00"), 1.0),
        (2L, 20L, "c", ts("2024-01-01 00:00:00"), 5.0))
        .toDF("k", "id", "op", "ts", "v")
      val b1 = Seq(
        (1L, 11L, "u", ts("2024-01-02 00:00:00"), 2.0),
        (2L, 21L, "d", ts("2024-01-02 00:00:00"), 0.0),
        (3L, 30L, "c", ts("2024-01-02 00:00:00"), 9.0))
        .toDF("k", "id", "op", "ts", "v")
      runBatchFile(b0)
      runBatchFile(b1)
      val got = histRows(Scd.historyFromTable(spark, table, Seq("k"),
        "ts", "id", "op"))
      val oneShot = histRows(Scd.history(b0.unionByName(b1), Seq("k"),
        "ts", "id", "op"))
      assert(got == oneShot)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("state table through a REAL AvailableNow stream: foreachBatch " +
      "maintenance equals the one-shot latest") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("scd_stream").toString
    val table = "graft_scd_stream_state"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      def runBatchFile(df: org.apache.spark.sql.DataFrame): Unit = {
        df.coalesce(1).write.mode("append").parquet(s"$tmp/src")
        val q = spark.readStream
          .schema("k LONG, id LONG, op STRING, ts TIMESTAMP, v DOUBLE")
          .parquet(s"$tmp/src")
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            Scd.mergeBatchLatest(b, Seq("k"), "ts", "id", table,
              s"$tmp/st", id)
            ()
          }.start()
        q.awaitTermination()
      }
      val b0 = Seq(
        (1L, 10L, "c", ts("2024-01-01 00:00:00"), 1.0),
        (2L, 20L, "c", ts("2024-01-01 00:00:00"), 5.0))
        .toDF("k", "id", "op", "ts", "v")
      val b1 = Seq(
        (1L, 11L, "u", ts("2024-01-02 00:00:00"), 2.0),
        (2L, 21L, "d", ts("2024-01-02 00:00:00"), 0.0),
        (3L, 30L, "c", ts("2024-01-02 00:00:00"), 9.0))
        .toDF("k", "id", "op", "ts", "v")
      runBatchFile(b0)
      runBatchFile(b1)
      val got = Scd.stateFromTable(spark, table, Seq("k"), "ts", "id", "op")
        .select(col("k"), col("id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val oneShot = Scd.latest(b0.unionByName(b1), Seq("k"), "ts", "id",
        "op").select(col("k"), col("id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == oneShot && got == Map(1L -> 11L, 3L -> 30L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("scd3: current + newest differing prior value; deleted keys absent") {
    val got = Scd.scd3(changes, Seq("k"), "ts", "id", "op", Seq("v"))
      .select(col("k"), col("v"), col("id"), col("v_prev"))
      .orderBy(col("k"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toList
    assert(got == List(
      (1L, 3.0, 12L, Some(2.0)), // newest differing prior, not the oldest
      (2L, 7.0, 22L, Some(5.0)), // the delete row itself is not a version
      // key 3 absent: last change is a delete
    ))
  }

  test("scd3: never-changed attribute yields NULL prev; attrs independent") {
    import spark.implicits._
    val df = Seq(
      // v never changes; s changes twice (x -> y -> z)
      (1L, 10L, "c", ts("2024-01-01 00:00:00"), 5.0, "x"),
      (1L, 11L, "u", ts("2024-01-02 00:00:00"), 5.0, "y"),
      (1L, 12L, "u", ts("2024-01-03 00:00:00"), 5.0, "z"))
      .toDF("k", "id", "op", "ts", "v", "s").repartition(3)
    val r = Scd.scd3(df, Seq("k"), "ts", "id", "op", Seq("v", "s")).head()
    assert(r.getAs[Double]("v") === 5.0)
    assert(r.getAs[String]("s") === "z")
    assert(r.isNullAt(r.fieldIndex("v_prev"))) // never changed
    assert(r.getAs[String]("s_prev") === "y")  // newest differing, not "x"
  }

  test("scd3: a NULL-valued prior version that differs IS the prev " +
    "(documented ambiguity with never-changed)") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "c", ts("2024-01-01 00:00:00"), Some(1.0)),
      (1L, 11L, "u", ts("2024-01-02 00:00:00"), Option.empty[Double]),
      (1L, 12L, "u", ts("2024-01-03 00:00:00"), Some(2.0)))
      .toDF("k", "id", "op", "ts", "v").repartition(3)
    val r = Scd.scd3(df, Seq("k"), "ts", "id", "op", Seq("v")).head()
    assert(r.getAs[Double]("v") === 2.0)
    // the newest differing prior version carries NULL — v_prev is NULL
    // by contract (callers needing the distinction use Type-2 history)
    assert(r.isNullAt(r.fieldIndex("v_prev")))
  }

  test("scd3 is partition-layout invariant") {
    val a = Scd.scd3(changes, Seq("k"), "ts", "id", "op", Seq("v"))
      .collect().toSet
    val b = Scd.scd3(changes.repartition(1), Seq("k"), "ts", "id", "op",
      Seq("v")).collect().toSet
    assert(a === b)
  }
}
