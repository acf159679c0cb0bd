package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate suppression (O-8): the JetStream 120 s `duplicate_window`
  * (`config/nats/stream.json:14`) re-expressed on Spark.
  *
  * Streaming: `dropDuplicatesWithinWatermark` — state is bounded by the
  * watermark delay, which is the exact semantic of the JetStream window and
  * stays O(keys-within-window) at any scale.
  * Batch (replay/backfill): keep the first event per key and drop later
  * copies arriving within the window of the kept one.
  */
object Dedup {

  val DefaultWindow = "120 seconds"

  /** Streaming form. `eventTimeCol` must be an event-time timestamp column. */
  def withinWatermark(stream: DataFrame, keyCols: Seq[String],
                      eventTimeCol: String = "timestamp",
                      window: String = DefaultWindow): DataFrame =
    stream
      .withWatermark(eventTimeCol, window)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Batch replay form with ANCHORED-window semantics, matching
    * `dropDuplicatesWithinWatermark` / the JetStream duplicate window: the
    * first event per key is kept and becomes the anchor; every later copy
    * within `windowMicros` of the *kept* event is dropped; the first copy
    * beyond the window is kept and becomes the new anchor. (A plain `lag`
    * compares to the previous row kept-or-dropped, which collapses a chain
    * of duplicates spanning more than one window — wrong.)
    *
    * Physical plan: one hash shuffle on the key + a sort within partitions,
    * then a streaming per-partition scan carrying only (current key, anchor)
    * — O(1) state per task regardless of group size, so no skew-driven OOM
    * at 100 TB even if one key dominates a partition.
    */
  def batchWindowed(df: DataFrame, keyCols: Seq[String],
                    eventTimeCol: String = "timestamp",
                    windowMicros: Long = 120000000L): DataFrame = {
    val sorted = df
      .withColumn("_us", unix_micros(col(eventTimeCol)))
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col) :+ col("_us"): _*)
    val schema = sorted.schema
    val kIdx = keyCols.map(schema.fieldIndex)
    val usIdx = schema.fieldIndex("_us")
    val kept = sorted.rdd.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var anchorUs = Long.MinValue
      it.filter { row =>
        val k = kIdx.map(row.get)
        val us = row.getLong(usIdx)
        if (k != curKey) { curKey = k; anchorUs = us; true }
        else if (us - anchorUs > windowMicros) { anchorUs = us; true }
        else false
      }
    }
    df.sparkSession.createDataFrame(kept, schema).drop("_us")
  }

  /** Exact dedup on a key (idempotent-consumer replay: keep first by time). */
  def exactFirst(df: DataFrame, keyCols: Seq[String],
                 orderCol: String = "timestamp"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
