package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** External event sources (O-9) and input union (O-20): the reference's
  * secondary flow — external systems (payroll, timeclock, benefits)
  * publishing on `hr.external.<system>.<type>` subjects, converted to
  * internal domain events and merged with the CDC-derived stream
  * (`docs/system-design.md:245-252`, `docs/design.md:31-37`).
  *
  * Physically an external ledger is just another `graft-changelog` subtree
  * (`<root>/external/<system>/…`), so the same DataSourceV2 source, offset
  * tracking and directory pruning apply; only the payload schema differs.
  */
object External {

  /** Payroll salary-update message (`hr.external.payroll.salary-update`). */
  val payrollSalaryUpdate: StructType = StructType(Seq(
    StructField("employee_id", IntegerType),
    StructField("old_salary", DecimalType(12, 2)),
    StructField("new_salary", DecimalType(12, 2)),
    StructField("reason", StringType),
    StructField("effective_date", DateType),
    StructField("event_time", TimestampType),
    StructField("source_system", StringType)))

  /** Wire rows (db=external, table=payroll) → SalaryAdjusted domain events
    * in the Schemas.domainEvent shape — the "converts to internal domain
    * event" step. Deterministic eventId keeps external replays idempotent
    * exactly like CDC-derived events.
    */
  def payrollToDomainEvents(wire: DataFrame): DataFrame =
    wire
      .filter(col("db") === "external" && col("table") === "payroll")
      .select(from_json(col("value"), payrollSalaryUpdate).as("m"))
      .filter(col("m.employee_id").isNotNull && col("m.new_salary").isNotNull)
      .select(
        md5(concat_ws("|", lit("SalaryAdjusted"), col("m.employee_id"),
          unix_millis(col("m.event_time")))).as("eventId"),
        lit("SalaryAdjusted").as("eventType"),
        lit("compensation").as("eventCategory"),
        col("m.event_time").as("timestamp"),
        col("m.employee_id").cast("string").as("aggregateId"),
        lit("Employee").as("aggregateType"),
        lit("1.0").as("version"),
        to_json(struct(
          col("m.employee_id").as("employeeId"),
          col("m.old_salary").as("oldSalary"),
          col("m.new_salary").as("newSalary"),
          col("m.reason").as("reason"),
          col("m.effective_date").as("effectiveDate"))).as("payload"),
        struct(
          coalesce(col("m.source_system"), lit("external")).as("source"),
          concat_ws("|", lit("hr.external.payroll.salary-update"),
            col("m.employee_id"), unix_millis(col("m.event_time"))).as("causationId"),
          lit(null).cast("string").as("correlationId"),
          lit(null).cast("string").as("userId")).as("metadata"),
        lit(Rules.subjects("SalaryAdjusted")).as("subject"))

  /** O-20: merge CDC-derived and external domain-event streams into the one
    * outbound stream. `unionByName` keeps it schema-safe as either side
    * gains columns; both sides already share Schemas.domainEvent.
    */
  def unionStreams(streams: Seq[DataFrame]): DataFrame =
    streams.reduceLeft(_.unionByName(_))
}
