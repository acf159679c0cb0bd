package graft.cdc

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Columnar sinks (O-6/O-7/O-10/O-11): the ClickHouse-MergeTree and
  * JetStream layers re-expressed as partitioned, sorted parquet.
  *
  *  - Event store (`hr_events`, docs/design.md:169-183): PARTITION BY month,
  *    ORDER BY (event_type, event_timestamp, aggregate_id) →
  *    `partitionBy(event_month)` + `sortWithinPartitions` — gives downstream
  *    readers partition pruning + run-length-friendly sort order, the same
  *    physical win MergeTree buys.
  *  - Audit trail (docs/design.md:185-197): same shape on changed_at.
  *  - Subject sink (O-6): wire-format rows partitioned by subject.
  *  - Retention sweep (O-7): drop partitions older than max_age
  *    (stream.json:9-13) — a metadata operation, never a scan.
  */
object Sinks {

  def writeEventStore(events: DataFrame, path: String,
                      mode: SaveMode = SaveMode.Append): Unit =
    events
      .withColumn("event_month", date_format(col("timestamp"), "yyyyMM"))
      .repartition(col("event_month"))
      .sortWithinPartitions(col("eventType"), col("timestamp"), col("aggregateId"))
      .write.mode(mode)
      .partitionBy("event_month")
      .parquet(path)

  def writeAudit(audit: DataFrame, path: String,
                 mode: SaveMode = SaveMode.Append): Unit =
    audit
      .withColumn("changed_month", date_format(col("changed_at"), "yyyyMM"))
      .repartition(col("changed_month"))
      .sortWithinPartitions(col("entity_type"), col("changed_at"), col("entity_id"))
      .write.mode(mode)
      .partitionBy("changed_month")
      .parquet(path)

  /** Outbound publish: one directory per subject (NATS fan-out analog,
    * consumers subscribe by wildcard = partition-pruned read).
    */
  def writeSubjects(wire: DataFrame, path: String,
                    mode: SaveMode = SaveMode.Append): Unit =
    wire
      .repartition(col("subject"))
      .write.mode(mode)
      .partitionBy("subject")
      .parquet(path)

  /** Retention sweep (max_age, discard=old): drop month partitions strictly
    * older than `maxAgeMonths` relative to `nowMs`. Purely partition-level —
    * no data read.
    */
  def sweepRetention(path: String, maxAgeMonths: Int, nowMs: Long,
                     partitionCol: String = "event_month"): Seq[String] = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMM")
    val cutoff = java.time.Instant.ofEpochMilli(nowMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
      .minusMonths(maxAgeMonths.toLong)
    val dir = new java.io.File(path)
    val dropped = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .filter(_.getName.startsWith(s"$partitionCol="))
      .filter { d =>
        val month = d.getName.stripPrefix(s"$partitionCol=")
        scala.util.Try(
          java.time.YearMonth.parse(month, fmt).atDay(1)
            .isBefore(cutoff.withDayOfMonth(1))).getOrElse(false)
      }
    dropped.foreach { d =>
      Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      d.delete()
    }
    dropped.map(_.getName).toSeq
  }
}
