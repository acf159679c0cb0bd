package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("topk_doubles equals the window-rank form, incl. duplicates and NULLs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map { i =>
      val g = s"g${i % 7}"
      // duplicates on purpose (coarse rounding) + some NULLs
      val v: java.lang.Double =
        if (i % 19 == 0) null else math.rint(rnd.nextDouble() * 50) / 10.0
      (g, v)
    }
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy($"g").agg(TopK.topk_doubles($"v", 5).as("top"))
      .select($"g", $"top")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    val want = df.filter($"v".isNotNull)
      .withColumn("rk",
        row_number().over(Window.partitionBy($"g").orderBy($"v".desc)))
      .filter($"rk" <= 5)
      .groupBy($"g").agg(sort_array(collect_list($"v"), asc = false).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(got == want)
  }

  test("k larger than the group returns everything; all-NULL group is empty") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None),
      ("b", None)).map { case (g, v) => (g, v.map(Double.box).orNull) }
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(TopK.topk_doubles($"v", 10).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(got == Map("a" -> List(3.0, 1.0), "b" -> Nil))
  }

  test("the aggregate runs with map-side partial merge, not a window sort") {
    import spark.implicits._
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy($"event_type").agg(TopK.topk_doubles($"value", 5).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate; partial +
    // final stages prove the bounded heap merges map-side, and no Window
    // (full per-group sort) appears anywhere
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("heap keeps the k largest under adversarial insertion orders") {
    val h = new TopKHeap(3)
    Seq(5.0, 1.0, 9.0, 7.0, 3.0, 8.0, 2.0).foreach(h.add)
    assert(h.sortedDesc().toList == List(9.0, 8.0, 7.0))
    val asc = new TopKHeap(3)
    (1 to 100).foreach(i => asc.add(i.toDouble))
    assert(asc.sortedDesc().toList == List(100.0, 99.0, 98.0))
    val merged = new TopKHeap(3)
    merged.addAll(h); merged.addAll(asc)
    assert(merged.sortedDesc().toList == List(100.0, 99.0, 98.0))
    val rt = TopKHeap.fromBytes(3, merged.toBytes) // serde round trip
    assert(rt.sortedDesc().toList == List(100.0, 99.0, 98.0))
  }
}
