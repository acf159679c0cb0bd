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
      // range partitioning keeps write parallelism when one month is hot
      // (repartition(month) would funnel the live month through one task)
      .repartitionByRange(col("event_month"), col("eventType"),
        col("timestamp"), col("aggregateId"))
      .sortWithinPartitions(col("eventType"), col("timestamp"), col("aggregateId"))
      .write.mode(mode)
      .partitionBy("event_month")
      .parquet(path)

  def writeAudit(audit: DataFrame, path: String,
                 mode: SaveMode = SaveMode.Append): Unit =
    audit
      .withColumn("changed_month", date_format(col("changed_at"), "yyyyMM"))
      .repartitionByRange(col("changed_month"), col("entity_type"),
        col("changed_at"), col("entity_id"))
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
      .repartitionByRange(col("subject"), col("ts_ms"))
      .write.mode(mode)
      .partitionBy("subject")
      .parquet(path)

  /** Retention sweep (max_age, discard=old): drop month partitions strictly
    * older than `maxAgeMonths` relative to `nowMs`. Purely partition-level —
    * no data read.
    */
  def sweepRetention(path: String, maxAgeMonths: Int, nowMs: Long,
                     partitionCol: String = "event_month"): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMM")
    val cutoff = java.time.Instant.ofEpochMilli(nowMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
      .minusMonths(maxAgeMonths.toLong).withDayOfMonth(1)
    // Hadoop FileSystem API, not java.io.File: the sweep must work on
    // whatever scheme the store lives on (HDFS, S3A, local), and the
    // recursive delete removes nested files the flat listing would miss.
    val root = new Path(path)
    val fs = root.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val dropped = fs.listStatus(root)
      .filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith(s"$partitionCol="))
      .filter { d =>
        val month = d.getPath.getName.stripPrefix(s"$partitionCol=")
        scala.util.Try(
          java.time.YearMonth.parse(month, fmt).atDay(1)
            .isBefore(cutoff)).getOrElse(false)
      }
    dropped.foreach(d => fs.delete(d.getPath, true))
    dropped.map(_.getPath.getName).toSeq
  }
}
