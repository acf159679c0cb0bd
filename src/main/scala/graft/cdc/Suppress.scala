package graft.cdc

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** No-op change suppression — emit a key's row only when its tracked
  * value tuple actually CHANGED since the key's previous row. The
  * classic CDC noise filter (reference behavior: a binlog carries every
  * UPDATE, including touch-only/heartbeat writes where no tracked
  * column moved; downstream consumers want state TRANSITIONS, not
  * writes; cf. mike840609/debezium-nats-cdc docker/debezium usage of
  * ExtractNewRecordState, whose consumers see every write).
  *
  * Two forms with identical semantics, spec-pinned equal:
  *
  *  - [[suppressUnchanged]] (batch): per-key (ts, id)-ordered
  *    `lag(struct(values))` with null-safe comparison — one key
  *    shuffle, O(1) window state per row. The DuckDB-replayable form
  *    (`cdc_change_suppress`).
  *  - [[suppressUnchangedStream]] (streaming): the engine's ONE
  *    `flatMapGroupsWithState` operator — built-ins cover every other
  *    stateful shape here (dedup-within-watermark, tumbling/session/
  *    hopping windows), but "compare against the key's LAST EMITTED
  *    value across batches" is custom per-key state by nature. State is
  *    the last value tuple as its canonical JSON rendering (exact
  *    equality — no hash-collision false-suppression), a few hundred
  *    bytes per ACTIVE key in the state store; rows inside a batch are
  *    processed in (ts, id) order so a batch with several writes per
  *    key emits exactly the transitions the batch form would.
  *
  * Ordering contract: transitions are evaluated in (event-time, id)
  * order WITHIN each micro-batch and in arrival order across batches —
  * the per-key-ordered-changelog contract the ledger source already
  * guarantees (the reference's binlog is per-key ordered too). A
  * cross-batch late row is compared against the newest state, not
  * spliced into history: replaying out-of-order history belongs to
  * [[Scd]], not the noise filter.
  *
  * NULL semantics: the value tuple is compared null-safely — a NULL in
  * a tracked column is a value, so null→x and x→null both emit. The
  * batch form's `<=>` on structs and the JSON token agree: `to_json`
  * drops null fields, and with fixed field names that render is
  * injective on value tuples (a dropped field names exactly one
  * nulled column), so token equality ⇔ null-safe tuple equality.
  */
object Suppress {

  /** Batch form: keep each key's first row and every row whose
    * `valueCols` tuple differs from the key's previous row in
    * (`tsCol`, `idCol`) order. NULL-safe struct comparison.
    */
  def suppressUnchanged(df: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one tracked value column")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.withColumn("_v", struct(valueCols.map(col): _*))
      .withColumn("_pv", lag(col("_v"), 1).over(w))
      .filter(!(col("_pv") <=> col("_v")))
      .drop("_v", "_pv")
  }

  /** Streaming form (see object doc). `idCol` must be a LongType
    * column; rows flow through unchanged minus suppressed ones.
    *
    * State retention: by default (`stateTtl = None`) state is held
    * forever — the store grows with LIFETIME key cardinality, which is
    * only acceptable for bounded key domains. For churning key spaces
    * (the reference's employees table deletes and re-creates keys) pass
    * an event-time `stateTtl`: the input must carry a watermark on
    * `tsCol`, and a key idle past the TTL (watermark − last event time
    * > ttl) has its state EVICTED. Eviction semantics are documented
    * at-least-once on transitions, never lossy: an evicted key's next
    * row always re-emits (the filter has no memory of it), so a
    * consumer may see a repeated unchanged tuple after a long idle gap
    * but can never miss a change.
    */
  def suppressUnchangedStream(df: DataFrame, keyCol: String, tsCol: String,
                              idCol: String, valueCols: Seq[String],
                              stateTtl: Option[java.time.Duration] = None
                             ): DataFrame = {
    require(valueCols.nonEmpty, "need at least one tracked value column")
    val spark = df.sparkSession
    import spark.implicits._
    val withT = df
      .withColumn("_t", to_json(struct(valueCols.map(col): _*)))
      .withColumn("_us", unix_micros(col(tsCol)))
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(withT.schema)
    val ttlMs = stateTtl.map(_.toMillis)
    val timeout = ttlMs.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.EventTimeTimeout)
    val out = withT
      .groupByKey(r => String.valueOf(r.getAs[Any](keyCol)))
      .flatMapGroupsWithState[String, Row](OutputMode.Append(), timeout) {
        (_: String, rows: Iterator[Row], state: GroupState[String]) =>
          if (state.hasTimedOut) {
            // idle past the TTL: drop the tuple — the key's next row
            // re-emits (at-least-once transitions, never a lost change)
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toArray.sortBy(r =>
              (r.getAs[Long]("_us"), r.getAs[Long](idCol)))
            var last = state.getOption.orNull
            val kept = sorted.filter { r =>
              val t = r.getAs[String]("_t")
              val changed = last == null || last != t
              last = t
              changed
            }
            if (last != null) state.update(last)
            ttlMs.foreach { ttl =>
              // timeout anchored at the key's newest event time: fires
              // once the watermark passes it, i.e. after `ttl` of
              // event-time idleness. A late batch whose anchor already
              // trails the watermark clamps forward — Spark rejects a
              // timeout at/behind the current watermark.
              if (sorted.nonEmpty)
                state.setTimeoutTimestamp(math.max(
                  sorted.last.getAs[Long]("_us") / 1000L + ttl,
                  state.getCurrentWatermarkMs() + 1L))
            }
            kept.iterator
          }
      }
    out.toDF().drop("_t", "_us")
  }
}
