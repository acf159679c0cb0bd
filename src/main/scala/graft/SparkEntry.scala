package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2) to DataFrame builders over a
  * scale-factor directory of parquet tables; `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's correctness gate.
  */
object SparkEntry {

  /** Flagship: the FULL CDC pipeline on sf0.001 — envelope construction,
    * duplicate suppression, rule dispatch, broadcast enrichment, validation
    * and the event-store aggregation shape, as one chained query.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CdcAnalog.queries("cdc_full_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.CdcAnalog.queries ++
      graft.queries.Corpus.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Events.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.CdcAnalog.oracleSql ++
      graft.queries.Corpus.oracleSql ++
      graft.queries.Curation.oracleSql ++
      graft.queries.Events.oracleSql
}
