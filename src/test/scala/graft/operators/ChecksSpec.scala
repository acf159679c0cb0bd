package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // (id, name, score, dept) — nulls, range breakers, pattern breakers,
  // a duplicated key and an orphan FK
  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Some("AA-1"), Some(10.0), Some(100L)),
      (2L, Some("AB-2"), Some(99.0), Some(101L)),
      (3L, None, Some(-5.0), Some(100L)),      // null name, score below lo
      (4L, Some("zz"), None, Some(999L)),       // bad pattern, null score, orphan
      (4L, Some("AC-4"), Some(50.0), None))     // duplicate id, null fk
      .toDF("id", "name", "score", "dept")
  }

  private def parents = {
    import spark.implicits._
    Seq(100L, 101L).toDF("dept_id")
  }

  test("scalar report: hand-counted violations, null semantics per check") {
    val rep = Checks.scalarReport(fixture, Seq(
      Checks.notNull("name"),
      Checks.inRange("score", lit(0.0), lit(100.0)),
      Checks.matches("name", "^[A-Z]{2}-[0-9]$")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(rep === Set(
      ("not_null", "name", 5L, 1L, false),
      // NULL score is NOT a range violation (declare notNull separately)
      ("in_range", "score", 5L, 1L, false),
      // NULL name IS a pattern violation, plus the literal "zz"
      ("matches", "name", 5L, 2L, false)))
  }

  test("uniqueness: counts rows beyond the first per duplicated key") {
    val rep = Checks.uniquenessReport(fixture, Seq("id")).collect().head
    assert(rep.getString(0) === "unique" && rep.getLong(2) === 5L &&
      rep.getLong(3) === 1L && !rep.getBoolean(4))
    val ok = Checks.uniquenessReport(fixture.filter(col("id") =!= 4L),
      Seq("id")).collect().head
    assert(ok.getLong(3) === 0L && ok.getBoolean(4))
  }

  test("referential: null FKs skipped, orphans counted") {
    val rep = Checks.referentialReport(fixture, "dept", parents, "dept_id")
      .collect().head
    // 4 non-null FK rows, one (999) orphaned
    assert(rep.getLong(2) === 4L && rep.getLong(3) === 1L &&
      !rep.getBoolean(4))
  }

  test("suite unions every declared check deterministically") {
    val rep = Checks.suite(fixture,
      scalars = Seq(Checks.notNull("id")),
      uniqueKeys = Seq(Seq("id")),
      references = Seq(("dept", parents, "dept_id")))
    assert(rep.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("not_null", "referential", "unique"))
  }

  test("all scalar checks run in ONE scan of the input") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("checks_scan").toString
    try {
      fixture.write.mode("overwrite").parquet(s"$tmp/t")
      val df = spark.read.parquet(s"$tmp/t")
      val rep = Checks.scalarReport(df, Seq(
        Checks.notNull("name"),
        Checks.inRange("score", lit(0.0), lit(100.0)),
        Checks.matches("name", "^[A-Z]{2}-[0-9]$"),
        Checks.notNull("dept"),
        Checks.inRange("id", lit(0L), lit(10L))))
      rep.collect() // force execution so the AQE plan is final
      // AQE's toString prints the final AND the initial plan — count
      // scans in the final section only
      val plan = rep.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans == 1,
        s"expected ONE scan for 5 scalar checks, got $scans in:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("empty frame: totals zero, everything passes") {
    val empty = fixture.filter(col("id") < 0L)
    val rep = Checks.suite(empty,
      scalars = Seq(Checks.notNull("name")),
      uniqueKeys = Seq(Seq("id")),
      references = Seq(("dept", parents, "dept_id")))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(rep === Set(("not_null", 0L, 0L, true), ("unique", 0L, 0L, true),
      ("referential", 0L, 0L, true)))
  }

  test("freshness: within lag passes, stale fails, empty fails with -1") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000L)
    val df = Seq((1L, t(1000000000L)), (2L, t(5000000000L)))
      .toDF("id", "ts")
    // newest = 5e9 us; asOf 6e9: lag 1e9 <= 2e9 -> fresh
    val fresh = Checks.freshnessReport(df, "ts", asOfUs = 6000000000L,
      maxLagUs = 2000000000L).head()
    assert(fresh.getLong(2) === 1000000000L) // observed lag
    assert(fresh.getLong(3) === 0L && fresh.getBoolean(4))
    // asOf 9e9: lag 4e9 > 2e9 -> stale
    val stale = Checks.freshnessReport(df, "ts", asOfUs = 9000000000L,
      maxLagUs = 2000000000L).head()
    assert(stale.getLong(3) === 1L && !stale.getBoolean(4))
    // empty table: lag -1, cannot be fresh
    val empty = Checks.freshnessReport(df.filter(col("id") < 0), "ts",
      asOfUs = 1L, maxLagUs = Long.MaxValue).head()
    assert(empty.getLong(2) === -1L && empty.getLong(3) === 1L)
    // suite integration: the freshness row rides the union
    val suite = Checks.suite(df, Seq(Checks.notNull("ts")),
      freshness = Some(("ts", 6000000000L, 2000000000L)))
      .collect().map(_.getString(0)).toSet
    assert(suite === Set("not_null", "fresh"))
  }

  test("benford: exact digit census; log-uniform passes, uniform flags") {
    import spark.implicits._
    // hand census: cents 123|4 -> 1, 250|0 -> 2, 19|99 -> 1, 0 dropped,
    // NULL dropped, -3.5 -> |.|350 -> 3
    val df = Seq(Some(1.234), Some(2.5), Some(0.1999), Some(0.0),
      Option.empty[Double], Some(-3.5)).toDF("v")
    val got = Checks.benfordReport(df, "v").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got(1) === 2L && got(2) === 1L && got(3) === 1L)
    assert((4 to 9).forall(got(_) === 0L))
    assert(got.values.sum === 4L)

    // log-uniform magnitudes follow Benford; uniform ones do not
    val logUni = (1 to 4000).map(i =>
      math.pow(10.0, (i * 37 % 4000) / 1000.0)).toDF("v")
    assert(Checks.benfordReport(logUni, "v").filter(col("flagged"))
      .count() === 0L, "log-uniform data must pass")
    val uniform = (1 to 4000).map(i => 1000.0 + (i * 37 % 4000)).toDF("v")
    assert(Checks.benfordReport(uniform, "v").filter(col("flagged"))
      .count() > 0L, "uniform data must flag")
  }

  test("maintained suite state: batches merge to the one-shot report; " +
      "replay and compaction move nothing") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1718000000000L + s * 1000L)
    val rows = Seq(
      (1L, "alpha", ts(10)), (2L, null, ts(20)), (3L, "Bad!", ts(30)),
      (60L, "beta", ts(40)), (5L, "gamma", ts(500)), (7L, "delta", ts(60)))
    val df = rows.toDF("v", "name", "ts").localCheckpoint(true)
    val scalars = Seq(Checks.notNull("name"),
      Checks.inRange("v", lit(1L), lit(50L)),
      Checks.matches("name", "^[a-z]+$"))
    val asOf = 1718000000000000L + 600L * 1000000L
    val oneShot = Checks.scalarReport(df, scalars)
      .unionByName(Checks.freshnessReport(df, "ts", asOf, 120L * 1000000L))
      .collect().map(_.toSeq).toSet
    val salt = java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    val table = s"graft_dq_suite_spec_$salt"
    val tmp = java.nio.file.Files.createTempDirectory(s"dqsuite_$salt")
      .toString
    try {
      def report() = Checks
        .suiteFromTable(spark, table, asOf, 120L * 1000000L)
        .collect().map(_.toSeq).toSet
      Checks.mergeBatchSuite(df.filter($"v" % 2 === 0), scalars, "ts",
        table, s"$tmp/suite", batchId = 0L)
      Checks.mergeBatchSuite(df.filter($"v" % 2 === 1), scalars, "ts",
        table, s"$tmp/suite", batchId = 1L)
      assert(report() === oneShot,
        "merged batches must equal the one-shot suite exactly")
      // crash replay: the same batch rewrites its own partition
      Checks.mergeBatchSuite(df.filter($"v" % 2 === 1), scalars, "ts",
        table, s"$tmp/suite", batchId = 1L)
      assert(report() === oneShot, "a replayed batch must move nothing")
      // compaction folds partitions without changing the report
      val (before, after) = Checks.compactSuite(spark, table, 1L)
      assert(before > 0 && after > 0)
      assert(report() === oneShot, "compaction must move nothing")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("benford: zero observations cannot pass the audit silently") {
    import spark.implicits._
    // an empty table AND a non-empty one with no value >= 0.01 both hit
    // the degenerate path: defined zeros, every digit flagged — never
    // NULLs a downstream filter(flagged) would silently drop
    for (df <- Seq(Seq.empty[Double].toDF("v"),
                   Seq(0.0, 0.004, -0.009).toDF("v"))) {
      val got = Checks.benfordReport(df, "v").collect()
      assert(got.length === 9)
      assert(got.forall(r => r.getLong(1) === 0L), "n must be 0")
      assert(got.forall(r => r.getDouble(2) === 0.0), "share must be 0")
      assert(got.forall(r => r.getDouble(4) === r.getDouble(3)),
        "dev must equal the expected share")
      assert(got.forall(r => r.getBoolean(5)), "every digit must flag")
    }
  }
}
