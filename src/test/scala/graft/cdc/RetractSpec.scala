package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Retraction-based MV maintenance (cdc.Retract): the delta algebra must
  * telescope to the view over current state under any batching, arrival
  * order, replay, and compaction.
  */
class RetractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new java.sql.Timestamp(1718000000000L + s * 1000L)

  /** (user, ts, id, type, value) event log — exercises group movement,
    * delete, re-create after delete, and an update-first user.
    */
  private val log = Seq(
    // user 1: created in (click, band 0), moves to band 2, then dies
    (1L, ts(1), 101L, "signup", 10.0),
    (1L, ts(2), 102L, "click", 120.0),
    (1L, ts(3), 103L, "error", 0.0),
    // user 2: first event is an update (no prior) — upsert semantics
    (2L, ts(1), 201L, "view", 55.0),
    (2L, ts(2), 202L, "view", 57.0),
    // user 3: dies then re-creates in a different group
    (3L, ts(1), 301L, "signup", 30.0),
    (3L, ts(2), 302L, "error", 0.0),
    (3L, ts(3), 303L, "purchase", 210.0),
    // user 4: two deletes in a row (second retracts nothing)
    (4L, ts(1), 401L, "click", 80.0),
    (4L, ts(2), 402L, "error", 0.0),
    (4L, ts(3), 403L, "error", 0.0))

  private def events: DataFrame = {
    import spark.implicits._
    log.toDF("user_id", "ts", "event_id", "event_type", "value")
      .withColumn("props", lit("{}"))
  }

  private val groupOf = (img: org.apache.spark.sql.Column) =>
    struct(img.getField("event_type").as("event_type"),
      floor(img.getField("value") / 50).cast("long").as("band"))
  private val measureOf = (img: org.apache.spark.sql.Column) =>
    floor(img.getField("value") * 100)

  /** The model: view recomputed from the latest live row per user. */
  private def model(ev: DataFrame): Set[(String, Long, Long, Long)] = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    ev.withColumn("op", EventsAsChangeLog.opCol)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "d")
      .groupBy($"event_type", floor($"value" / 50).cast("long").as("band"))
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * 100)).cast("long").as("total"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private def applied(deltas: DataFrame): Set[(String, Long, Long, Long)] =
    deltas.groupBy(col("event_type"), col("band"))
      .agg(sum(col("d_n")).as("n"), sum(col("d_sum")).cast("long").as("total"))
      .filter(col("n") > 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("deltas telescope to the current-state view") {
    val got = applied(Retract.mvDeltas(
      EventsAsChangeLog.retractable(events), groupOf, measureOf))
    assert(got === model(events))
    // the moved-out and died groups are gone, not zero-count rows
    assert(!got.exists(_._1 == "signup"))
    assert(!got.exists(_._1 == "click"))
  }

  test("a scalar group column auto-wraps into a single `group` field") {
    val cl = EventsAsChangeLog.retractable(events)
    val scalar = Retract.mvDeltas(cl,
      img => img.getField("event_type"), measureOf)
    assert(scalar.columns.toSeq === Seq("group", "d_n", "d_sum"))
    val viaStruct = Retract.mvDeltas(cl,
      img => struct(img.getField("event_type").as("group")), measureOf)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(scalar) === rows(viaStruct))
  }

  test("any batching of the changelog sums to the same view") {
    val cl = EventsAsChangeLog.retractable(events).localCheckpoint(true)
    // three arbitrary splits, including one that separates a retraction
    // from the add it cancels
    val batches = Seq(
      cl.filter(col("ts_ms") % 3 === 0), cl.filter(col("ts_ms") % 3 === 1),
      cl.filter(col("ts_ms") % 3 === 2))
    val together = batches.map(b =>
        Retract.mvDeltas(b, groupOf, measureOf))
      .reduce(_ unionByName _)
    assert(applied(together) === model(events))
  }

  test("maintained table: replayed batch and compaction move nothing") {
    val salt = java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    val table = s"graft_retract_spec_$salt"
    val tmp = java.nio.file.Files.createTempDirectory(s"retract_$salt").toString
    try {
      val cl = EventsAsChangeLog.retractable(events).localCheckpoint(true)
      val b0 = cl.filter(col("ts_ms") <= 1718000002000L)
      val b1 = cl.filter(col("ts_ms") > 1718000002000L)
      Retract.mergeBatchMv(b0, groupOf, measureOf, table, s"$tmp/mv", 0L)
      Retract.mergeBatchMv(b0, groupOf, measureOf, table, s"$tmp/mv", 0L) // replay
      Retract.mergeBatchMv(b1, groupOf, measureOf, table, s"$tmp/mv", 1L)
      val before = Retract.mvFromTable(spark, table)
        .select(col("event_type"), col("band"), col("n"), col("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(before === model(events))
      Retract.compactMv(spark, table, upToBatchId = 1L)
      val after = Retract.mvFromTable(spark, table)
        .select(col("event_type"), col("band"), col("n"), col("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(after === before)
      // steady state: exactly one consolidated partition
      val ids = spark.table(table).select(col("_batch_id")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(-2L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("retractable adapter: dead rows never retracted, update-first adds") {
    import spark.implicits._
    val cl = EventsAsChangeLog.retractable(events)
      .select($"op", $"before".isNotNull.as("hasB"),
        $"after".isNotNull.as("hasA"),
        coalesce($"before.event_id", $"after.event_id").as("img_eid"),
        $"ts_ms")
      .collect()
    // user 4's SECOND delete (event 403): prior row already dead -> both
    // images null (no double retraction); its FIRST delete (402) retracts
    def at(tsMs: Long, op: String) = cl.filter(r =>
      r.getAs[Long]("ts_ms") == tsMs && r.getAs[String]("op") == op)
    val d402 = at(1718000002000L, "d")
      .filter(r => !r.isNullAt(3) && r.getAs[Long]("img_eid") == 401L)
    assert(d402.length == 1 && d402.forall(r =>
      r.getAs[Boolean]("hasB") && !r.getAs[Boolean]("hasA")))
    val dead = cl.filter(r => !r.getAs[Boolean]("hasB") &&
      !r.getAs[Boolean]("hasA"))
    assert(dead.length == 1 && dead.head.getAs[String]("op") == "d" &&
      dead.head.getAs[Long]("ts_ms") == 1718000003000L)
    // user 2's first event is op 'u' with no prior: pure add
    val uFirst = at(1718000001000L, "u")
    assert(uFirst.nonEmpty && uFirst.forall(r =>
      !r.getAs[Boolean]("hasB") && r.getAs[Boolean]("hasA")))
  }
}
