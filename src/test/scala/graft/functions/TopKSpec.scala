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

  test("topk_structs equals the window-rank form on long and string payloads") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 2000).map { i =>
      // coarse scores force ties; the payload tie-break must match the
      // window's (score desc, payload asc)
      (s"g${i % 7}", math.rint(rnd.nextDouble() * 30) / 10.0, i.toLong,
        f"t${rnd.nextInt(400)}%04d")
    }
    val df = rows.toDF("g", "s", "id", "term").repartition(8)
    // compare rank-by-rank: the aggregate's order is exactly the window's
    // (score desc, payload asc), so row (g, rank) -> (score, payload)
    // must match one-for-one
    def want(payCol: String) = df
      .withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy($"s".desc, col(payCol).asc)))
      .filter($"rk" <= 5)
      .collect().map(r => (r.getString(0), r.getInt(4)) ->
        (r.getDouble(1), r.get(df.columns.indexOf(payCol)))).toMap
    def got(payCol: String) = df.groupBy($"g")
      .agg(TopK.topk_structs($"s", col(payCol), 5).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).cast("int").as("rk"),
        $"col.score", $"col.payload")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.get(3))).toMap
    assert(got("id") == want("id"))
    assert(got("term") == want("term"))
  }

  test("topk_structs skips NULL score or payload; oversize k returns all") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(2.0), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(3.0), None), ("a", Some(1.0), Some(9L)))
      .map { case (g, s, p) =>
        (g, s.map(Double.box).orNull, p.map(Long.box).orNull) }
      .toDF("g", "s", "p")
    val got = df.groupBy($"g").agg(TopK.topk_structs($"s", $"p", 10).as("top"))
      .select(explode($"top").as("e"))
      .select($"e.score", $"e.payload")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toList
    assert(got == List((2.0, 1L), (1.0, 9L)))
  }

  test("pair heap: total order, eviction, merge, serde round-trips both payload kinds") {
    import org.apache.spark.unsafe.types.UTF8String
    val h = new TopKPairHeap(3, stringPayload = false)
    Seq((5.0, 7L), (5.0, 2L), (9.0, 1L), (5.0, 4L), (1.0, 0L))
      .foreach { case (s, p) => h.add(s, java.lang.Long.valueOf(p)) }
    // equal scores keep the SMALLEST payloads
    assert(h.sortedDesc().toList.map { case (s, p) =>
      (s, p.asInstanceOf[java.lang.Long].longValue()) }
      == List((9.0, 1L), (5.0, 2L), (5.0, 4L)))
    val rt = TopKPairHeap.fromBytes(3, stringPayload = false, h.toBytes)
    assert(rt.sortedDesc().toList.map(_._1) == List(9.0, 5.0, 5.0))
    val merged = new TopKPairHeap(3, stringPayload = false)
    merged.addAll(rt)
    merged.add(5.0, java.lang.Long.valueOf(3L))
    assert(merged.sortedDesc().toList.map { case (s, p) =>
      (s, p.asInstanceOf[java.lang.Long].longValue()) }
      == List((9.0, 1L), (5.0, 2L), (5.0, 3L)))

    val sh = new TopKPairHeap(2, stringPayload = true)
    Seq((1.0, "zebra"), (1.0, "apple"), (1.0, "mango"))
      .foreach { case (s, p) => sh.add(s, UTF8String.fromString(p)) }
    val srt = TopKPairHeap.fromBytes(2, stringPayload = true, sh.toBytes)
    assert(srt.sortedDesc().toList.map(_._2.toString)
      == List("apple", "mango"))
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
