package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FreqItemsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic Zipf-ish stream: item i contributes floor(N/i) copies,
    * i = 1..card — real skew, exact truth cheap to compute.
    */
  private def zipfRows(top: Int, card: Int): Seq[Long] =
    (1 to card).flatMap(i => Seq.fill(top / i)(i.toLong))

  private def summarize(rows: Seq[Long], m: Int,
                        parts: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val salt = new scala.util.Random(7)
    spark.createDataset(salt.shuffle(rows)).toDF("item")
      .repartition(parts)
      .agg(FreqItems.freq_items(col("item"), m).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.lb"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("no-eviction regime: est = lb = exact count, regardless of layout") {
    val rows = zipfRows(600, 40) // 40 distinct << m
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 8, 32)) {
      val got = summarize(rows, m = 256, parts = parts)
      assert(got.keySet == truth.keySet)
      got.foreach { case (item, (est, lb)) =>
        assert(est == truth(item) && lb == truth(item),
          s"item $item parts $parts: ($est, $lb) vs exact ${truth(item)}")
      }
    }
  }

  test("eviction regime: bounds hold and every item above total/m is " +
      "tracked, across partition layouts") {
    val rows = zipfRows(4000, 900)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = rows.size.toLong
    val m = 64
    for (parts <- Seq(1, 4, 16)) {
      val got = summarize(rows, m, parts)
      assert(got.size <= m)
      assert(got.size == m, "summary should be full (eviction happened)")
      // one-sided bounds per tracked item
      got.foreach { case (item, (est, lb)) =>
        val t = truth(item)
        assert(lb <= t && t <= est,
          s"item $item parts $parts: bounds ($lb, $est) miss exact $t")
      }
      // pigeonhole tracking guarantee survives the merges
      val frequent = truth.filter { case (_, c) => c > total / m }.keySet
      assert(frequent.subsetOf(got.keySet),
        s"parts $parts: missing frequent items ${frequent -- got.keySet}")
    }
  }

  test("sketch-proposes / exact-confirms recovers the exact top-k under " +
      "eviction") {
    import spark.implicits._
    val rows = zipfRows(4000, 900)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = spark.createDataset(
      new scala.util.Random(13).shuffle(rows)).toDF("item").repartition(16)
    val candidates = df
      .agg(FreqItems.freq_items(col("item"), 64).as("sk"))
      .select(explode(col("sk")).as("e")).select(col("e.item"))
    val confirmed = df.join(candidates.hint("broadcast"), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item")).limit(10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toList
    val want = truth.toList.sortBy { case (i, c) => (-c, i) }.take(10)
    assert(confirmed == want)
  }

  test("string items round-trip serde and keep exact counts pre-eviction") {
    import spark.implicits._
    val rows = (1 to 50).flatMap(i => Seq.fill(i)(s"w$i"))
    val got = spark.createDataset(rows).toDF("item").repartition(8)
      .agg(FreqItems.freq_items(col("item"), 128).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == rows.groupBy(identity).view
      .mapValues(_.size.toLong).toMap)
  }

  test("NULL items are skipped; output order is est desc, item asc") {
    import spark.implicits._
    val df = Seq[java.lang.Long](1L, 1L, 2L, null, 2L, 3L).toDF("item")
    val out = df.agg(FreqItems.freq_items(col("item"), 8).as("sk"))
      .select(col("sk")).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List((1L, 2L, 2L), (2L, 2L, 2L), (3L, 1L, 1L)))
  }

  test("summary serde round-trips through bytes (heap order preserved)") {
    val s = new SpaceSavingSummary(4, false)
    Seq(1L, 2L, 1L, 3L, 4L, 5L, 1L, 5L).foreach(v =>
      s.add(java.lang.Long.valueOf(v)))
    val back = SpaceSavingSummary.fromBytes(4, false, s.toBytes)
    assert(back.streamTotal == s.streamTotal)
    assert(back.sortedDesc().toList == s.sortedDesc().toList)
    assert(back.minCount == s.minCount)
  }

  test("the aggregate plans as ObjectHashAggregate with partial merge") {
    import spark.implicits._
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val df = ev.agg(FreqItems.freq_items($"user_id", 512).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(1500))
  }
}
