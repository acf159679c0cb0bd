package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TeamCompositionChanged (O-25) — the one genuinely stateful, windowed
  * transformer in the reference spec (`docs/design.md:262`: "Multiple
  * employee transfers → Team reorganization").
  *
  * Semantics: a department whose composition is touched by at least
  * `threshold` transfers (an employee moving IN or OUT counts one touch)
  * within one tumbling window emits one TeamCompositionChanged event for
  * that (department, window).
  *
  * The aggregation is a plain tumbling-window `groupBy` — in batch it is a
  * single hash aggregate; on a stream the SAME code runs as a watermarked
  * stateful aggregation whose state is bounded by the watermark delay
  * (apply `withWatermark` upstream, see `teamCompositionChangedStream`).
  * Shuffle key is (window, departmentId): uniform unless one department
  * reorgs the whole company — at 100 TB the window bound keeps any single
  * key's state to one window's transfers.
  */
object WindowedRules {

  val DefaultWindow = "1 hour"
  val DefaultThreshold = 3

  /** From EmployeeTransferred domain events → TeamCompositionChanged domain
    * events (Schemas.domainEvent shape).
    */
  def teamCompositionChanged(events: DataFrame,
                             windowDur: String = DefaultWindow,
                             threshold: Int = DefaultThreshold): DataFrame = {
    val touches = events
      .filter(col("eventType") === "EmployeeTransferred")
      .select(
        col("timestamp"),
        col("aggregateId").as("employeeId"),
        explode(array_compact(array(
          get_json_object(col("payload"), "$.fromDepartmentId"),
          get_json_object(col("payload"), "$.toDepartmentId")))).as("departmentId"))
    touches
      .groupBy(window(col("timestamp"), windowDur).as("w"), col("departmentId"))
      .agg(
        count(lit(1)).as("transferCount"),
        // approx (HLL): exact distinct aggregation is unsupported on
        // streams; deterministic for a given input set, exact at team scale
        approx_count_distinct(col("employeeId")).as("employeesMoved"))
      .filter(col("transferCount") >= threshold)
      .select(
        md5(concat_ws("|", lit("TeamCompositionChanged"), col("departmentId"),
          unix_millis(col("w.start")))).as("eventId"),
        lit("TeamCompositionChanged").as("eventType"),
        lit("org").as("eventCategory"),
        col("w.end").as("timestamp"), // event time = window close
        col("departmentId").cast("string").as("aggregateId"),
        lit("Department").as("aggregateType"),
        lit("1.0").as("version"),
        to_json(struct(
          col("departmentId"), col("transferCount"), col("employeesMoved"),
          col("w.start").as("windowStart"), col("w.end").as("windowEnd"))).as("payload"),
        struct(
          lit("hr-event-publisher").as("source"),
          concat_ws("|", lit("window"), col("departmentId"),
            unix_millis(col("w.start"))).as("causationId"),
          lit(null).cast("string").as("correlationId"),
          lit(null).cast("string").as("userId")).as("metadata"),
        lit(Rules.subjects("TeamCompositionChanged")).as("subject"))
  }

  /** Streaming form: watermarked so Spark can close windows and evict
    * state; emits once per (department, window) when the watermark passes
    * the window end (append mode).
    */
  def teamCompositionChangedStream(events: DataFrame,
                                   watermarkDelay: String = "10 minutes",
                                   windowDur: String = DefaultWindow,
                                   threshold: Int = DefaultThreshold): DataFrame =
    teamCompositionChanged(
      events.withWatermark("timestamp", watermarkDelay), windowDur, threshold)
}
