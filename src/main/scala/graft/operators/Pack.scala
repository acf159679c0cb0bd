package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for training-data pipelines (builder
  * brief): stream documents in id order into fixed token-budget bins (the
  * concat-and-chunk batch layout LLM trainers feed from), where a document
  * belongs to the bin its running token offset starts in.
  *
  * The core is a DISTRIBUTED PREFIX SUM — the textbook two-phase scan:
  *
  *   1. bucket every row by `id / bucketSpan` and aggregate per-bucket token
  *      sums (hash-partitioned, fully parallel);
  *   2. prefix-sum the per-bucket sums (a window over ONE ROW PER BUCKET —
  *      thousands of rows where the corpus has billions, so the single-task
  *      stage is metadata-sized; recurse the same trick if it ever isn't);
  *   3. within each bucket, window-cumsum in parallel and add the bucket's
  *      prefix offset.
  *
  * No global `Window.orderBy(id)` over the data ever exists — that plan
  * funnels the whole corpus through one task, which is exactly what dies at
  * 100 TB.
  */
object Pack {

  /** Running token count BEFORE each row (exclusive prefix sum) in `idCol`
    * order, plus the bin index at `budget` tokens per bin. Output columns:
    * idCol, tokCol, `cum_before`, `bin`. Ids must be unique — duplicate
    * ids make the within-bucket ordering (and thus the prefix sum)
    * nondeterministic.
    *
    * `materialize` (default true) checkpoints the narrow (id, tokens,
    * bucket) projection so the source is scanned ONCE — both the bucket-sum
    * pass and the final pass would otherwise each re-read (and re-compute
    * token counts over) the full input. ~24 bytes/row of executor storage
    * buys the second 100 TB scan; pass false to trade back.
    */
  def packBins(df: DataFrame, idCol: String, tokCol: String, budget: Long,
               bucketSpan: Long = 1024L, materialize: Boolean = true): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(bucketSpan >= 1, s"bucketSpan must be >= 1, got $bucketSpan")
    val projected = df.select(col(idCol), col(tokCol).cast("bigint").as(tokCol))
      .withColumn("_bucket", floor(col(idCol) / bucketSpan))
    val rows = if (materialize) projected.localCheckpoint(true) else projected

    // phase 1: per-bucket sums (parallel); phase 2: exclusive prefix over
    // the bucket sums — one row per bucket, so the unpartitioned window is
    // a small-metadata stage, not a data stage
    val offsets = rows.groupBy(col("_bucket"))
      .agg(sum(col(tokCol)).as("_bsum"))
      .withColumn("_offset",
        coalesce(
          sum(col("_bsum")).over(
            Window.orderBy(col("_bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_bucket"), col("_offset"))

    // phase 3: within-bucket cumsum in parallel + the bucket's offset
    val inBucket = Window.partitionBy(col("_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    rows.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("cum_before",
        col("_offset") + coalesce(sum(col(tokCol)).over(inBucket), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget).cast("bigint"))
      .drop("_bucket", "_offset")
  }
}
