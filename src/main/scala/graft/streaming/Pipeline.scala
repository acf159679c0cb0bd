package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.{ChangeStream, Dedup, Rules, Schemas, Validate}

/** The end-to-end streaming CDC pipeline (O-1 → O-32): change-ledger source
  * → typed envelopes → single-pass rule engine → validation split →
  * dedup → store-then-publish sinks, with crash-recovery idempotence.
  *
  * Delivery contract (reference `docs/design.md:572-577`,
  * `docs/system-design.md:351-373,551-558`):
  *  - at-least-once from the source (checkpointed offsets; a batch that
  *    fails mid-write is replayed in full on restart),
  *  - effectively-once in the sinks: every batch writes into
  *    `_batch_id=<id>` partitions with dynamic partition overwrite, so a
  *    replayed batch REPLACES its own partitions instead of appending
  *    duplicates — idempotent without any read-before-write,
  *  - store-THEN-publish inside one `foreachBatch`: the event store commit
  *    strictly precedes the outbound publish, so a consumer can never see a
  *    published event that is not yet queryable in the store.
  */
object Pipeline {

  /** Wire rows → domain events: typed per-table envelopes through the
    * single-pass rule engine, unioned. Call on a MATERIALIZED (persisted)
    * batch: the per-table branches then read from memory, not N× from disk.
    */
  def transform(wire: DataFrame): DataFrame = {
    val tables = Rules.all.map(_.table).distinct.filter(Schemas.tables.contains)
    tables.map { t =>
      Rules.applyAll(
        ChangeStream.deserialize(wire.filter(col("table") === t), Schemas.tables(t)), t)
    }.reduce(_.unionByName(_))
  }

  /** Idempotent batch write: land in `partitionCols + _batch_id` partitions
    * with dynamic overwrite — a replay of batch N rewrites exactly batch N's
    * partitions. Sorted within partitions for the MergeTree-style physical
    * order (docs/design.md:182-183).
    */
  def writeBatchIdempotent(df: DataFrame, path: String, batchId: Long,
                           partitionCols: Seq[String],
                           sortCols: Seq[String]): Unit =
    df.withColumn("_batch_id", lit(batchId))
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols :+ "_batch_id": _*)
      .parquet(path)

  /** Store-then-publish for one micro-batch. `events` must be deterministic
    * for the batch (it is: rules are pure and the batch is replanned from
    * checkpointed offsets), so replay rewrites identical partitions.
    * `failpoint` is a test hook simulating a crash between the two writes.
    */
  def storeThenPublish(events: DataFrame, batchId: Long,
                       storePath: String, publishPath: String,
                       failpoint: Long => Unit = _ => ()): Unit = {
    val withMonth = events
      .withColumn("event_month", date_format(col("timestamp"), "yyyyMM"))
    writeBatchIdempotent(withMonth, storePath, batchId,
      Seq("event_month"), Seq("eventType", "timestamp", "aggregateId"))
    failpoint(batchId)
    // publish strictly AFTER the store write committed
    writeBatchIdempotent(events, batchId = batchId, path = publishPath,
      partitionCols = Seq("subject"), sortCols = Seq("timestamp"))
  }

  /** Read the event store back without the physical bookkeeping column. */
  def readEventStore(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("_batch_id")

  /** Launch the full pipeline as a checkpointed streaming query.
    * `failpoint` is a test hook invoked between store and publish.
    */
  def run(spark: SparkSession, ledgerRoot: String, storePath: String,
          publishPath: String, checkpoint: String,
          maxFilesPerTrigger: Option[Int] = None,
          trigger: Trigger = Trigger.AvailableNow(),
          failpoint: Long => Unit = _ => ()): StreamingQuery = {
    val reader = spark.readStream.format("graft-changelog")
      .option("path", ledgerRoot)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    reader.load()
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (wire: DataFrame, batchId: Long) =>
        wire.persist()
        try {
          val events = transform(wire)
          val valid = Validate.split(events).valid
          // within-batch dedup on the deterministic eventId (cross-batch
          // duplicates are handled by the streaming dedup form, Dedup
          // .withinWatermark, or absorbed by replay idempotence)
          val deduped = Dedup.exactFirst(valid, Seq("eventId"))
          deduped.persist()
          try storeThenPublish(deduped, batchId, storePath, publishPath, failpoint)
          finally deduped.unpersist()
        } finally wire.unpersist()
        ()
      }
      .start()
  }

}
