package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed fact tables — the physical-design lever for REPEATED joins and
  * aggregations on one key (`docs/design.md`'s event store is consumed by
  * recurring enrichment joins and per-aggregate rollups; the LLM-pipeline
  * twin is a corpus keyed by doc/order id that every downstream stage
  * joins back to).
  *
  * A shuffle join on a 100 TB fact pays the full-width exchange EVERY
  * query. Writing the table ONCE as `bucketBy(B, key)` (+ in-bucket sort)
  * moves that exchange to write time: the bucketed scan REPORTS
  * hashpartitioning(key, B), so any join or aggregation on `key` between
  * co-bucketed tables plans with ZERO exchanges on the bucketed sides —
  * scan → sort-merge join → partial agg, shuffle-free until the final
  * result collection (asserted by exchange count in `BucketingSpec`, with
  * auto-broadcast disabled so the assertion pins the shuffle shape, per
  * the repo's plan-test discipline). Point lookups on the key prune to
  * one bucket (`SelectedBucketsCount` in the scan node, also
  * spec-asserted).
  *
  * This is the relational-side sibling of the repo's index tables
  * (`TextDedup.bandedIndex`, `SimHash.segmentIndex`, `AnnIndex.ivfIndex`):
  * same discipline — pay one organized write, then every delta/query
  * joins exchange-free on the organized side.
  *
  * At scale: choose B so a bucket's rows fit one task comfortably
  * (~hundreds of MB); both join sides MUST use the same B (Spark joins
  * differing bucket counts with an exchange on one side). The
  * `repartition(B, key)` before the write yields exactly one file per
  * bucket per write, which is what lets the sorted-bucket scan skip the
  * in-task sort on single-file buckets and keeps file count = B, not
  * B × write-tasks.
  */
object Bucketing {

  /** Write `df` as catalog table `table` at `path`, bucketed AND sorted by
    * `key` into `buckets` files (one per bucket). Overwrites.
    */
  def bucketTable(df: DataFrame, table: String, path: String,
                  key: String, buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.repartition(buckets, col(key))
      .write.mode("overwrite").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two CO-BUCKETED tables on their (possibly differently
    * named) bucket keys. With matching bucket counts the planned join has
    * no exchange on either side; this helper only binds names — the plan
    * property comes from the tables' layout.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, leftKey: String,
                    rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
