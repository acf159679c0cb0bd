package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Operational metrics (O-22/O-23; reference `docs/design.md:808-826`,
  * `docs/system-design.md:395-400`).
  *
  * Two forms:
  *  - `observe(...)`: zero-cost counters riding the existing job (no extra
  *    scan) — events.published.total analog, read via QueryExecutionListener
  *    or StreamingQueryProgress.
  *  - aggregation queries: per-type counts and latency percentiles as
  *    first-class DataFrames (the "materialized view" analog, O-24).
  */
object Metrics {

  /** Attach published/failed counters to a domain-event stream. */
  def observed(events: DataFrame, name: String = "cdc_metrics"): DataFrame =
    events.observe(
      name,
      count(lit(1)).as("events_published_total"),
      // DISTINCT aggregates are not allowed in observed metrics; HLL is
      // exact at event-type cardinality anyway
      approx_count_distinct(col("eventType")).as("event_types_seen"),
      max(col("timestamp")).as("max_event_time"))

  /** events.published.total by event type. */
  def byType(events: DataFrame): DataFrame =
    events.groupBy(col("eventType"))
      .agg(count(lit(1)).as("published_total"))

  /** CDC lag / end-to-end latency percentiles per minute window (O-23):
    * processing ts vs event ts.
    */
  def latency(events: DataFrame,
              eventTime: String = "timestamp",
              processedTime: String = "processed_at"): DataFrame =
    events
      .withColumn("lag_ms",
        (unix_millis(col(processedTime)) - unix_millis(col(eventTime))).cast("double"))
      .groupBy(window(col(eventTime), "1 minute").as("w"))
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col("lag_ms"), lit(0.5), lit(10000)).as("p50_ms"),
        percentile_approx(col("lag_ms"), lit(0.95), lit(10000)).as("p95_ms"),
        max(col("lag_ms")).as("max_ms"))
      .select(col("w.start").as("minute"), col("n"),
        col("p50_ms"), col("p95_ms"), col("max_ms"))

  /** Daily event volumes by category (the capacity-table materialized view,
    * docs/system-design.md:334-339).
    */
  def dailyVolumes(events: DataFrame): DataFrame =
    events.groupBy(
      to_date(col("timestamp")).as("day"),
      col("eventCategory"))
      .agg(count(lit(1)).as("n"))
}
