package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // (zip, age_band, disease) — the classic k-anonymity shape
  private def table = {
    import spark.implicits._
    Seq(
      ("02139", "20-30", "flu"),
      ("02139", "20-30", "flu"),
      ("02139", "20-30", "cold"),
      ("02139", "30-40", "cancer"), // singleton group
      ("94305", "20-30", "flu"),
      ("94305", "20-30", "flu"),    // l = 1: 2 rows, same disease
      ("94305", "30-40", "cold"),
      ("94305", "30-40", "asthma"),
      ("94305", "30-40", "flu")
    ).toDF("zip", "age_band", "disease")
  }

  test("audit census: sizes, diversity, verdicts") {
    val got = Privacy.privacyAudit(table, Seq("zip", "age_band"),
        "disease", k = 2, l = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
      .toSet
    assert(got === Set(
      ("02139", "20-30", 3L, 2L, true, true),
      ("02139", "30-40", 1L, 1L, false, false),
      ("94305", "20-30", 2L, 1L, true, false),
      ("94305", "30-40", 3L, 3L, true, true)))
  }

  test("summary: achieved k/l, group count, rows at risk") {
    val r = Privacy.privacySummary(table, Seq("zip", "age_band"),
      "disease", k = 3).head()
    assert(r.getLong(0) === 1L) // k_achieved = smallest group
    assert(r.getLong(1) === 1L) // l_achieved
    assert(r.getLong(2) === 4L) // n_groups
    assert(r.getLong(3) === 3L) // rows in groups < 3: 1 + 2
  }

  test("enforcement keeps exactly the rows of groups >= k") {
    val kept = Privacy.enforceKAnonymity(table, Seq("zip", "age_band"), 3)
    assert(kept.count() === 6) // the two 3-row groups
    assert(kept.filter(col("zip") === "02139" &&
      col("age_band") === "30-40").count() === 0)
    // enforcement never edits surviving rows
    assert(kept.columns.toSeq === table.columns.toSeq)
  }

  test("NULL QIs form their own group and can satisfy k") {
    import spark.implicits._
    val df = Seq(
      (Some("z1"), "s1"), (None, "s2"), (None, "s3"), (None, "s2")
    ).toDF("zip", "disease")
    val audit = Privacy.privacyAudit(df, Seq("zip"), "disease", k = 2)
      .collect().map(r =>
        (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(audit === Set(
      (Some("z1"), 1L, 1L),
      (None, 3L, 2L)))
    val kept = Privacy.enforceKAnonymity(df, Seq("zip"), 2)
    assert(kept.count() === 3) // the NULL group survives k=2
    assert(kept.filter(col("zip").isNull).count() === 3)
  }

  test("all-NULL sensitive yields l = 0 (conservative)") {
    import spark.implicits._
    val df = Seq(("g", Option.empty[String]), ("g", Option.empty[String]))
      .toDF("qi", "s")
    val r = Privacy.privacyAudit(df, Seq("qi"), "s", k = 1, l = 1).head()
    assert(r.getLong(1) === 2L) // group_n
    assert(r.getLong(2) === 0L) // l_diversity
    assert(!r.getBoolean(4))    // fails even l = 1
  }

  test("pseudonymize: deterministic, join-preserving, NULL-preserving") {
    import spark.implicits._
    val a = Seq((1L, Some("alice")), (2L, Some("bob")), (3L, None))
      .toDF("id", "name")
    val b = Seq((10L, Some("alice")), (11L, Some("carol")))
      .toDF("oid", "name2").withColumnRenamed("name2", "name")
    val ta = Privacy.pseudonymize(a, Seq("name"), "s1")
    val tb = Privacy.pseudonymize(b, Seq("name"), "s1")
    // equal values map to equal tokens across frames (join preserved)
    val joined = ta.join(tb.withColumnRenamed("name", "name_b"),
      col("name") === col("name_b"))
    assert(joined.select("id", "oid").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet === Set((1L, 10L)))
    // NULL stays NULL; no raw value survives
    assert(ta.filter(col("id") === 3).head().isNullAt(1))
    assert(ta.filter(col("name") === "alice").count() === 0)
    // a different salt re-keys every token
    val tc = Privacy.pseudonymize(a, Seq("name"), "s2")
    assert(ta.filter(col("id") === 1).head().getString(1) !==
      tc.filter(col("id") === 1).head().getString(1))
    // and the recipe is the documented md5
    assert(ta.filter(col("id") === 1).head().getString(1) ===
      org.apache.commons.codec.digest.DigestUtils.md5Hex("s1:alice"))
  }

  test("enforcement census joins broadcast, never a data-sized window") {
    val kept = Privacy.enforceKAnonymity(table, Seq("zip", "age_band"), 2)
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"),
      s"enforcement must not use a window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast semi-join:\n$plan")
  }

  test("dpCounts: seeded Laplace release matches the scalar mechanism; " +
      "never the true count; seeds independent") {
    import spark.implicits._
    val df = (1 to 100).map(i => (if (i % 3 == 0) "a" else "b", i))
      .toDF("g", "v")
    // the injective encoding: md5(seed || md5(value1) || md5(value2)...)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def scalarNoise(seed: String, group: String, eps: Double): Double = {
      val hex = md5hex(seed + md5hex(group)).take(13)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        4503599627370496.0
      val c = u - 0.5
      // StrictMath.log, not math.log: Spark's `log` expression evaluates
      // through StrictMath, which differs from Math.log by 1 ulp on some
      // inputs — the bit-exact scalar model must use the same libm
      (-1.0 / eps) * math.signum(c) * StrictMath.log(1.0 - 2.0 * math.abs(c))
    }
    val got = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = "s1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") === 33.0 + scalarNoise("s1", "a", 0.5))
    assert(got("b") === 67.0 + scalarNoise("s1", "b", 0.5))
    // the release never equals the raw count (the draw is continuous)
    assert(got("a") !== 33.0)
    assert(got("b") !== 67.0)
    // a different seed draws different noise
    val other = Privacy.dpCounts(df, Seq("g"), 0.5, "s2")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(other("a") !== got("a"))
    // tighter epsilon -> (weakly) larger magnitude for the same u
    val loose = Privacy.dpCounts(df, Seq("g"), 2.0, "s1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(loose("a") - 33.0) < math.abs(got("a") - 33.0))
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(df, Seq("g"), 0.0, "s1")
    }
  }

  test("dpSums/dpMeans: clamp-before-sum bounds each row's influence; " +
      "the scalar Laplace chain replays; epsilon is monotone; NULLs skip") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def noise(seed: String, group: String, scale: Double): Double = {
      val hex = md5hex(seed + md5hex(group)).take(13)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        4503599627370496.0
      val c = u - 0.5
      // StrictMath: see the dpCounts scalar model note
      -scale * math.signum(c) * StrictMath.log(1.0 - 2.0 * math.abs(c))
    }
    // values straddle the clamp bounds; one NULL must contribute nothing
    val df = Seq(("a", Some(100.0)), ("a", Some(-50.0)), ("a", Some(7.0)),
      ("a", None), ("b", Some(3.0)), ("b", Some(12.0)))
      .toDF("g", "v")
    val got = Privacy.dpSums(df, Seq("g"), "v", lo = 0.0, hi = 10.0,
        epsilon = 0.5, seed = "s1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // clamped sums: a -> 10 + 0 + 7 = 17 (100 clips to 10, -50 to 0,
    // NULL skipped); b -> 3 + 10 = 13
    assert(got("a") === 17.0 + noise("s1", "a", (10.0 - 0.0) / 0.5))
    assert(got("b") === 13.0 + noise("s1", "b", 20.0))
    // epsilon monotone: looser epsilon -> (weakly) smaller magnitude
    val loose = Privacy.dpSums(df, Seq("g"), "v", 0.0, 10.0, 2.0, "s1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(loose("a") - 17.0) < math.abs(got("a") - 17.0))
    // the mean: eps/2 to the sum draw, eps/2 to the count draw,
    // independent salted seeds, max(noisyN, 1) denominator
    val mean = Privacy.dpMeans(df, Seq("g"), "v", 0.0, 10.0, 0.5, "s1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wantA = (17.0 + noise("s1#sum", "a", (10.0 - 0.0) / 0.25)) /
      math.max(3.0 + noise("s1#cnt", "a", 1.0 / 0.25), 1.0)
    assert(mean("a") === wantA)
    // refusals: bad bounds, bad epsilon
    intercept[IllegalArgumentException] {
      Privacy.dpSums(df, Seq("g"), "v", 10.0, 10.0, 0.5, "s1")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpMeans(df, Seq("g"), "v", 0.0, 10.0, 0.0, "s1")
    }
  }

  test("dpCounts: (seed, group) -> draw is injective across separator " +
      "collisions and NULL positions (ADVICE r12)") {
    import spark.implicits._
    // under the old concat_ws('|') encoding all four groups collided
    // onto ONE draw: ('x|','y') == ('x','|y') (separator in a value) and
    // ('x', NULL) == (NULL, 'x') == ('x') (concat_ws drops NULLs)
    val df = Seq(
      (Option("x|"), Option("y")),
      (Option("x"), Option("|y")),
      (Option("x"), Option.empty[String]),
      (Option.empty[String], Option("x"))
    ).toDF("g1", "g2")
    val noise = Privacy.dpCounts(df, Seq("g1", "g2"), 1.0, "s1")
      .collect().map(_.getDouble(2) - 1.0) // every group has count 1
    assert(noise.distinct.length == 4,
      s"distinct groups must draw independent noise, got ${noise.toSeq}")
  }
}
