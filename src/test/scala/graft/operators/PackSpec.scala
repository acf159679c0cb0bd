package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two-phase prefix sum equals the global-window reference") {
    import spark.implicits._
    // irregular token counts, ids crossing many bucket boundaries
    val df = spark.range(0, 5000)
      .select($"id".as("doc_id"), (pmod($"id" * 37 + 11, lit(97)) + 1).as("n_tok"))
    val packed = Pack.packBins(df, "doc_id", "n_tok", budget = 500L, bucketSpan = 64L)
      .select($"doc_id", $"cum_before", $"bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val reference = df
      .withColumn("cum_before",
        coalesce(sum($"n_tok").over(Window.orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", floor($"cum_before" / 500L).cast("bigint"))
      .select($"doc_id", $"cum_before", $"bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(packed.toSeq == reference.toSeq)
  }

  test("no data-sized unpartitioned window in the plan") {
    import spark.implicits._
    val df = spark.range(0, 1000)
      .select($"id".as("doc_id"), lit(7L).as("n_tok"))
    val plan = Pack.packBins(df, "doc_id", "n_tok", budget = 100L, bucketSpan = 64L)
      .queryExecution.optimizedPlan
    // every window over the DATA must be partitioned by _bucket; the only
    // unpartitioned window is the prefix over per-bucket SUMS (child is an
    // Aggregate, one row per bucket)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate}
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      if (w.partitionSpec.isEmpty) {
        val aggBelow = w.child.collectFirst { case a: Aggregate => a }
        assert(aggBelow.isDefined,
          s"unpartitioned window must sit on the bucket-sum aggregate, got:\n$w")
      }
    }
  }

  test("empty and single-bucket inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tok")
    assert(Pack.packBins(empty, "doc_id", "n_tok", 10L).count() == 0)
    val one = Seq((5L, 3L), (6L, 4L), (7L, 5L)).toDF("doc_id", "n_tok")
    val got = Pack.packBins(one, "doc_id", "n_tok", budget = 7L, bucketSpan = 1024L)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_before"),
        r.getAs[Long]("bin"))).toList
    assert(got == List((5L, 0L, 0L), (6L, 3L, 0L), (7L, 7L, 1L)))
  }
}
