package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adapts the driver's generic `events` table (TESTDATA.md) into a
  * Debezium-style change-event stream so the CDC operators can be exercised
  * (and benchmarked) at scale on driver-provided data.
  *
  * Envelope shape per reference `docs/cdc-guide.md:134-151`:
  * `{before, after, source{version,connector,name,ts_ms,db,table}, op, ts_ms}`.
  *
  * Deterministic op mapping: `signup -> 'c'` (row created), `error -> 'd'`
  * (row deleted), everything else (`click`/`view`/`purchase`) -> `'u'`.
  */
object EventsAsChangeLog {

  val opCol =
    when(col("event_type") === "signup", "c")
      .when(col("event_type") === "error", "d")
      .otherwise("u")

  /** The full row image carried in before/after. */
  private val rowImage =
    struct(
      col("event_id"), col("user_id"), col("event_type"),
      col("value"), col("props"))

  /** events table -> a changelog with TRUE before images (what Debezium
    * emits in full-row mode), for the retraction operators: each event's
    * `before` is the key's PREVIOUS live image (null for the key's first
    * event or when the prior op was a delete — a dead row is never
    * retracted twice), `after` is the event's own image unless it is a
    * delete. The per-key `lag` window exists only in this fixture adapter
    * — a real binlog delivers before images natively; `Retract` itself
    * never re-orders or rescans.
    */
  def retractable(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("op", opCol)
      .withColumn("_prev", lag(rowImage, 1).over(w))
      .withColumn("_prev_op", lag(col("op"), 1).over(w))
      .select(
        when(col("_prev").isNotNull && col("_prev_op") =!= "d", col("_prev"))
          .as("before"),
        when(col("op") =!= "d", rowImage).as("after"),
        col("op"),
        unix_millis(col("ts")).as("ts_ms"))
  }

  /** events table -> envelope DataFrame
    * (before, after, source, op, ts_ms, subject, event_key).
    */
  def envelopes(events: DataFrame): DataFrame = {
    val op = opCol.as("op")
    events
      .withColumn("op", opCol)
      .select(
        when(col("op") =!= "c", rowImage).as("before"),
        when(col("op") =!= "d", rowImage).as("after"),
        struct(
          lit("1.0").as("version"),
          lit("graft").as("connector"),
          lit("HCM.CDC.HR").as("name"),
          unix_millis(col("ts")).as("ts_ms"),
          lit("hrdb").as("db"),
          lit("events").as("table")).as("source"),
        col("op"),
        unix_millis(col("ts")).as("ts_ms"),
        col("ts"),
        // NATS-style routing subject: HCM.CDC.HR.<db>.<table>; here the
        // event_type plays the role of the table for fan-out realism.
        concat_ws(".", lit("HCM"), lit("CDC"), lit("HR"), lit("hrdb"),
          col("event_type")).as("subject"),
        // key = JSON of the primary key (application.properties:26-27)
        to_json(struct(col("event_id").as("id"))).as("event_key"))
  }
}
