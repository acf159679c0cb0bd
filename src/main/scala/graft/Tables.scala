package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under the given scale-factor directory.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shifted parquet encodings across driver generations:
    // TIMESTAMP(NANOS) (which Spark 4 refuses to read as a timestamp —
    // read as raw nanos and floor-truncate to micros, exactly DuckDB's
    // epoch_us on the same column), and timestamp[us] with
    // isAdjustedToUTC=false (TIMESTAMP_NTZ — cast to the session-UTC
    // TIMESTAMP, which preserves the stored micros and matches DuckDB's
    // naive reading). Either way downstream code sees TimestampType.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val nanosFixed =
      if (df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    nanosFixed.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(nanosFixed)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }
}
