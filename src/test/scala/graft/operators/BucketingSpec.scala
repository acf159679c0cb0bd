package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withBucketedPair[T](buckets: Int)(
      body: (String, String) => T): T = {
    import spark.implicits._
    val salt = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val liT = s"bkt_spec_li_$salt"
    val ordT = s"bkt_spec_ord_$salt"
    val tmp = java.nio.file.Files.createTempDirectory(s"bkt_spec_$salt")
      .toString
    try {
      Bucketing.bucketTable(
        graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
          .select($"l_orderkey", $"l_extendedprice", $"l_discount"),
        liT, s"$tmp/li", "l_orderkey", buckets)
      Bucketing.bucketTable(
        graft.Tables(spark, "/root/testdata/sf0.001", "orders")
          .select($"o_orderkey", $"o_orderpriority"),
        ordT, s"$tmp/ord", "o_orderkey", buckets)
      body(liT, ordT)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $liT")
      spark.sql(s"DROP TABLE IF EXISTS $ordT")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  /** Force the shuffle shape under assertion: a tiny test table would
    * broadcast and make the exchange count vacuous.
    */
  private def noBroadcast[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  test("join + per-key aggregate over co-bucketed tables plans with zero " +
      "exchanges on the bucketed sides") {
    import spark.implicits._
    withBucketedPair(8) { (liT, ordT) =>
      noBroadcast {
        val bucketed = Bucketing
          .coLocatedJoin(spark, liT, ordT, "l_orderkey", "o_orderkey")
          .groupBy($"o_orderkey", $"o_orderpriority")
          .agg(count(lit(1)).as("n"))
        val bucketedPlan = bucketed.queryExecution.executedPlan.toString
        // join AND aggregate both reuse the buckets' hashpartitioning
        assert(!bucketedPlan.contains("Exchange hashpartitioning"),
          bucketedPlan.take(2000))

        // the identical query over plain parquet shuffles both sides
        val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
        val o = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
        val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderkey", $"o_orderpriority")
          .agg(count(lit(1)).as("n"))
        val plainPlan = plain.queryExecution.executedPlan.toString
        assert("Exchange hashpartitioning".r.findAllIn(plainPlan).size >= 2,
          plainPlan.take(2000))

        // and the answers agree
        assert(bucketed.orderBy($"o_orderkey").collect().toSeq ==
          plain.orderBy($"o_orderkey").collect().toSeq)
      }
    }
  }

  test("a point filter on the bucket key prunes the scan to one bucket") {
    import spark.implicits._
    withBucketedPair(8) { (liT, _) =>
      // a lone scan has no downstream need for the bucket partitioning,
      // so the auto-bucketed-scan rule would disable bucketed reading
      // (and with it the pruning this test pins) — turn the auto rule
      // off to assert the pruning capability itself
      val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "false")
      try {
        val scan = spark.table(liT).filter($"l_orderkey" === 7L)
        val plan = scan.queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
          plan.take(2000))
      } finally spark.conf.set(key, prev)
    }
  }

  test("mismatched bucket counts fall back to an exchange (the contract " +
      "callers must know)") {
    import spark.implicits._
    val salt = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val aT = s"bkt_mis_a_$salt"
    val bT = s"bkt_mis_b_$salt"
    val tmp = java.nio.file.Files.createTempDirectory(s"bkt_mis_$salt")
      .toString
    try {
      noBroadcast {
        val df = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
          .select($"o_orderkey", $"o_orderpriority")
        Bucketing.bucketTable(df, aT, s"$tmp/a", "o_orderkey", 8)
        Bucketing.bucketTable(df.withColumnRenamed("o_orderkey", "k2")
          .withColumnRenamed("o_orderpriority", "p2"),
          bT, s"$tmp/b", "k2", 4)
        val joined = Bucketing.coLocatedJoin(spark, aT, bT, "o_orderkey", "k2")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("Exchange hashpartitioning"), plan.take(2000))
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $aT")
      spark.sql(s"DROP TABLE IF EXISTS $bT")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}
