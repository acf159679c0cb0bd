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

  /** Batch replay form: drop rows whose previous same-key row is within
    * `windowMicros`. Equivalent to the streaming semantics on an ordered
    * replay. One shuffle on the key — at 100 TB the key (eventId) is unique
    * and uniform, so no skew.
    */
  def batchWindowed(df: DataFrame, keyCols: Seq[String],
                    eventTimeCol: String = "timestamp",
                    windowMicros: Long = 120000000L): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(eventTimeCol))
    df.withColumn("_prev_us", lag(unix_micros(col(eventTimeCol)), 1).over(w))
      .filter(col("_prev_us").isNull ||
        unix_micros(col(eventTimeCol)) - col("_prev_us") > windowMicros)
      .drop("_prev_us")
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
