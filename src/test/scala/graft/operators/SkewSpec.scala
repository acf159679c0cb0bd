package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two-phase salted aggregation equals direct groupBy exactly") {
    import spark.implicits._
    // hot key: 10k rows on "hot", a handful elsewhere
    val df = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      Seq(("a", 1L), ("a", 2L), ("b", 7L))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count($"v").as("n"), sum($"v").as("total"),
        min($"v").as("lo"), max($"v").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val salted = Skew.twoPhaseAgg(df, Seq("k"), Map(
      "n" -> ($"v", "count"), "total" -> ($"v", "sum"),
      "lo" -> ($"v", "min"), "hi" -> ($"v", "max")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(salted == direct)
  }
}

class GraftExtensionsSpec extends AnyFunSuite {

  test("subject_matches is callable from SQL when extensions are installed") {
    val base = TestSpark.spark // ensures the shared SparkContext exists
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    // (.config("spark.sql.extensions", ...) is a STATIC conf read from the
    // SparkContext at first-session creation; with the shared test context
    // already running, install programmatically instead)
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      Seq("HCM.CDC.HR.hrdb.employees", "OTHER.CDC", "HCM.x")
        .toDF("s").createOrReplaceTempView("subs")
      val got = s2.sql(
        "SELECT s FROM subs WHERE subject_matches(s, 'HCM.>') ORDER BY s")
        .collect().map(_.getString(0)).toSeq
      assert(got == Seq("HCM.CDC.HR.hrdb.employees", "HCM.x"))
      // dynamic pattern column through SQL too
      val dyn = s2.sql(
        "SELECT s FROM subs WHERE subject_matches(s, concat('HCM', '.>')) ORDER BY s")
        .collect().map(_.getString(0)).toSeq
      assert(dyn == got)
      // the whole codegen-expression suite is SQL-reachable
      val row = s2.sql(
        """SELECT
          |  lang_id('the cat and the dog it was here with us') AS lang,
          |  simhash64(shingle_hashes('one two three four five', 3)) AS fp,
          |  size(minhash_signature(shingle_hashes('one two three four five', 3), 16)) AS sig_n,
          |  size(winnow_fingerprint('abcdefghijklmnopqrstuvwxyz', 8, 4)) AS n_fp,
          |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
          |  size(lsh_buckets(array(cast(1.0 as float), cast(-1.0 as float)), 4, 3, 2)) AS n_buckets
          |""".stripMargin).collect().head
      assert(row.getAs[String]("lang") == "en")
      assert(row.getAs[Int]("sig_n") == 16)
      assert(row.getAs[Int]("n_fp") > 0)
      assert(row.getAs[Double]("dot") == 11.0)
      assert(row.getAs[Int]("n_buckets") == 4)
      // round-9 registrations: md5 shingles, super-fingerprints, the
      // splitmix64 pair, and both bounded-heap aggregates
      val row9 = s2.sql(
        """SELECT
          |  size(shingle_md5('one two three four', 3)) AS n_md5,
          |  size(winnow_super('abcdefghijklmnopqrstuvwxyz0123456789', 8, 4, 3)) AS n_super,
          |  splitmix64(42L) AS h,
          |  splitmix64(42L, 7L) AS hs,
          |  leading_zeros64(1L) AS lz
          |""".stripMargin).collect().head
      assert(row9.getAs[Int]("n_md5") == 2)
      assert(row9.getAs[Int]("n_super") > 0)
      assert(row9.getAs[Long]("h") == graft.functions.SplitMix64.hash(42L))
      assert(row9.getAs[Long]("hs") != row9.getAs[Long]("h"))
      assert(row9.getAs[Int]("lz") == 63)
      Seq(("a", 3.0, 10L), ("a", 1.0, 11L), ("a", 2.0, 12L), ("b", 9.0, 13L))
        .toDF("g", "v", "id").createOrReplaceTempView("tk")
      val agg = s2.sql(
        """SELECT g, topk_doubles(v, 2) AS top2,
          |  topk_structs(v, id, 1)[0].payload AS best_id
          |FROM tk GROUP BY g ORDER BY g""".stripMargin).collect()
      assert(agg(0).getSeq[Double](1) == Seq(3.0, 2.0))
      assert(agg(0).getAs[Long]("best_id") == 10L)
      assert(agg(1).getAs[Long]("best_id") == 13L)
      val fi = s2.sql(
        """SELECT e.item, e.est, e.lb
          |FROM (SELECT explode(freq_items(id, 8)) AS e FROM tk)
          |ORDER BY e.est DESC, e.item""".stripMargin).collect()
      assert(fi.length == 4 && fi.forall(r =>
        r.getLong(1) == 1L && r.getLong(2) == 1L))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("degenerate sketch parameters fail at construction, not per-row") {
    import graft.functions._
    intercept[IllegalArgumentException] {
      ShingleHash.shingle_hashes(org.apache.spark.sql.functions.lit("a b c"), 0)
    }
    intercept[IllegalArgumentException] { WinnowingFingerprintExpr(null, 0, 4) }
    intercept[IllegalArgumentException] { WinnowingFingerprintExpr(null, 8, 0) }
    intercept[IllegalArgumentException] { MinHashSigExpr(null, 0) }
    intercept[IllegalArgumentException] { LshBucketsExpr(null, 0, 3, 2, 42L) }
    intercept[IllegalArgumentException] { LshBucketsExpr(null, 4, 32, 2, 42L) }
    intercept[IllegalArgumentException] { LshBucketsExpr(null, 4, 3, 0, 42L) }
  }
}
