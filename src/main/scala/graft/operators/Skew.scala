package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation (100 TB discipline): when one group key
  * dominates (a hot aggregate, a viral document), a plain `groupBy(key)`
  * funnels that key's entire volume through one reducer. The two-phase
  * form salts the key, partially aggregates the salted groups map-side and
  * across many reducers, then combines the partials — every operator here
  * is algebraic (count/sum/min/max), so the result is exactly equal.
  *
  * (AQE's skew-join handling covers joins; this covers aggregations, which
  * AQE does not re-balance.)
  */
object Skew {

  /** Exact groupBy-count/sum over skewed keys in two phases. `aggs` maps
    * output column name → (valueColumn, "count" | "sum" | "min" | "max").
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String],
                  aggs: Map[String, (Column, String)],
                  saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*),
        lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(
        aggs.head._2 match { case (c, f) => partialExpr(f, c).as(aggs.head._1) },
        aggs.tail.toSeq.map { case (name, (c, f)) => partialExpr(f, c).as(name) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        finalExpr(aggs.head._2._2, col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.toSeq.map { case (name, (_, f)) =>
          finalExpr(f, col(name)).as(name) }: _*)
  }

  private def partialExpr(fn: String, c: Column): Column = fn match {
    case "count" => count(c)
    case "sum"   => sum(c)
    case "min"   => min(c)
    case "max"   => max(c)
    case other   => throw new IllegalArgumentException(
      s"$other is not algebraic-combinable here")
  }

  private def finalExpr(fn: String, c: Column): Column = fn match {
    case "count" | "sum" => sum(c)
    case "min"           => min(c)
    case "max"           => max(c)
    case other           => throw new IllegalArgumentException(s"$other")
  }
}
