package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bottomK(values: Seq[Long], k: Int): Seq[Long] = {
    // scalar reference: the k smallest distinct shifted hashes
    values.map(v => graft.functions.SplitMix64.hash(v) >>> 1)
      .distinct.sorted.take(k)
  }

  test("sketch keeps exactly the k smallest distinct hash values") {
    import spark.implicits._
    val vals = (0L until 5000L) ++ (0L until 1000L) // duplicates on purpose
    val got = Kmv.sketch(vals.map(("g", _)).toDF("grp", "v"),
        Seq("grp"), "v", k = 64)
      .orderBy($"u").collect().map(_.getAs[Long]("u")).toSeq
    assert(got == bottomK(0L until 5000L, 64))
  }

  test("groups below k are kept whole and estimate exactly") {
    import spark.implicits._
    val df = (0L until 40L).map(("small", _)).toDF("grp", "v")
    val sk = Kmv.sketch(df, Seq("grp"), "v", k = 64)
    assert(sk.count() == 40)
    val est = Kmv.estimateFromSketch(sk, Seq("grp"), 64).head.getDouble(1)
    assert(est == 40.0)
  }

  test("estimate lands within the 1/sqrt(k) band across cardinalities") {
    import spark.implicits._
    val groups = Seq(2000L, 20000L, 100000L)
    val rows = groups.zipWithIndex.flatMap { case (n, g) =>
      (0L until n).map(i => (s"g$g", g * 1000000000L + i))
    }
    val est = Kmv.estimateFromSketch(
        Kmv.sketch(rows.toDF("grp", "v"), Seq("grp"), "v", k = 256),
        Seq("grp"), 256)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    groups.zipWithIndex.foreach { case (n, g) =>
      val rel = math.abs(est(s"g$g") - n) / n.toDouble
      // sd ~ 1/sqrt(k-2) = 6.3% at k=256; allow 3 sigma
      assert(rel < 0.19, s"n=$n est=${est(s"g$g")} rel=$rel")
    }
  }

  test("merged sketches equal the one-shot sketch of the union") {
    import spark.implicits._
    val a = (0L until 3000L).map(("g", _)).toDF("grp", "v")
    val b = (1500L until 6000L).map(("g", _)).toDF("grp", "v")
    val oneShot = Kmv.sketch(a.unionByName(b), Seq("grp"), "v", k = 128)
      .orderBy($"u").collect().map(_.getAs[Long]("u")).toSeq
    val merged = Kmv.mergeSketches(
        Kmv.sketch(a, Seq("grp"), "v", k = 128)
          .unionByName(Kmv.sketch(b, Seq("grp"), "v", k = 128)),
        Seq("grp"), k = 128)
      .orderBy($"u").collect().map(_.getAs[Long]("u")).toSeq
    assert(merged == oneShot)
  }

  test("maintained sketch table: merged == one-shot, replay- and compaction-safe") {
    import spark.implicits._
    val a = (0L until 3000L).map(("g", _)).toDF("grp", "v")
    val b = (1500L until 6000L).map(("g", _)).toDF("grp", "v")
    val salt = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val table = s"graft_kmv_spec_$salt"
    val tmp = java.nio.file.Files.createTempDirectory(s"kmv_$salt").toString
    def read() = Kmv.sketchFromTable(spark, table, Seq("grp"), 128)
      .orderBy($"u").collect().map(_.getAs[Long]("u")).toSeq
    try {
      Kmv.mergeBatch(a, Seq("grp"), "v", 128, table, s"$tmp/t", 0L)
      Kmv.mergeBatch(b, Seq("grp"), "v", 128, table, s"$tmp/t", 1L)
      val oneShot = Kmv.sketch(a.unionByName(b), Seq("grp"), "v", 128)
        .orderBy($"u").collect().map(_.getAs[Long]("u")).toSeq
      assert(read() == oneShot)
      // crash replay of an already-landed batch: dynamic overwrite of its
      // own partition, nothing inflates
      Kmv.mergeBatch(b, Seq("grp"), "v", 128, table, s"$tmp/t", 1L)
      assert(read() == oneShot)
      Kmv.compactSketch(spark, table, upToBatchId = 1L, Seq("grp"), 128)
      assert(read() == oneShot)
      // replay AFTER compaction: the idempotent-combine asymmetry — the
      // re-landed batch coexists with the consolidated partition and the
      // read-time distinct+bottom-k absorbs it
      Kmv.mergeBatch(b, Seq("grp"), "v", 128, table, s"$tmp/t", 1L)
      assert(read() == oneShot)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("intersection estimate tracks the true overlap, not the union") {
    import spark.implicits._
    // |A| = |B| = 20000, true overlap 2000 (10%): inclusion-exclusion over
    // HLL-grade union error would dwarf this; theta candidates stay tight
    val a = (0L until 20000L).toDF("v").withColumn("g", lit(1))
    val b = (18000L until 38000L).toDF("v").withColumn("g", lit(1))
    val ska = Kmv.sketch(a, Nil, "v", k = 256)
    val skb = Kmv.sketch(b, Nil, "v", k = 256)
    val row = Kmv.intersectEstimate(ska, skb, k = 256).head
    val est = row.getAs[Double]("est_intersect")
    assert(row.getAs[Long]("n_cand") > 0)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.5,
      s"est=$est expected ~2000")
  }

  test("pairwise matrix covers every unordered pair, zero rows kept") {
    import spark.implicits._
    // a∩b = 5000, a∩c = 0, b∩c = 2000
    val rows = (0L until 20000L).map(("a", _)) ++
      (15000L until 35000L).map(("b", _)) ++
      (33000L until 50000L).map(("c", _))
    val sk = Kmv.sketch(rows.toDF("seg", "v"), Seq("seg"), "v", k = 256)
    val got = Kmv.pairwiseIntersections(sk, "seg", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_cand"), r.getAs[Double]("est_intersect"))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(math.abs(got(("a", "b"))._2 - 5000.0) / 5000.0 < 0.5)
    assert(got(("a", "c")) == (0L, 0.0))
    assert(math.abs(got(("b", "c"))._2 - 2000.0) / 2000.0 < 0.6)
    // matrix pair (a,b) must equal the two-frame intersectEstimate
    val two = Kmv.intersectEstimate(
      sk.filter($"seg" === "a").select($"u"),
      sk.filter($"seg" === "b").select($"u"), k = 256).head
    assert(got(("a", "b"))._1 == two.getAs[Long]("n_cand"))
    assert(got(("a", "b"))._2 == two.getAs[Double]("est_intersect"))
  }

  test("exact-mode sides intersect exactly") {
    import spark.implicits._
    val a = (0L until 100L).toDF("v")
    val b = (60L until 160L).toDF("v")
    val row = Kmv.intersectEstimate(
      Kmv.sketch(a, Nil, "v", k = 256),
      Kmv.sketch(b, Nil, "v", k = 256), k = 256).head
    assert(row.getAs[Long]("n_cand") == 40L)
    assert(row.getAs[Double]("est_intersect") == 40.0)
  }

  test("disjoint sets estimate zero intersection") {
    import spark.implicits._
    val a = (0L until 5000L).toDF("v")
    val b = (1000000L until 1005000L).toDF("v")
    val row = Kmv.intersectEstimate(
      Kmv.sketch(a, Nil, "v", k = 64),
      Kmv.sketch(b, Nil, "v", k = 64), k = 64).head
    assert(row.getAs[Long]("n_cand") == 0L)
    assert(row.getAs[Double]("est_intersect") == 0.0)
  }

  test("difference estimate tracks |A \\ B| and completes the partition of A") {
    import spark.implicits._
    // |A| = 20000, |A ∩ B| = 2000 → |A \ B| = 18000
    val a = (0L until 20000L).toDF("v")
    val b = (18000L until 38000L).toDF("v")
    val ska = Kmv.sketch(a, Nil, "v", k = 256)
    val skb = Kmv.sketch(b, Nil, "v", k = 256)
    val d = Kmv.differenceEstimate(ska, skb, k = 256).head
    val i = Kmv.intersectEstimate(ska, skb, k = 256).head
    val est = d.getAs[Double]("est_diff")
    assert(math.abs(est - 18000.0) / 18000.0 < 0.25, s"est=$est expected ~18000")
    // same theta on both ops, and A's below-theta values partition into
    // (in B) + (not in B): the integer identity holds exactly
    assert(d.getAs[Long]("theta_long") == i.getAs[Long]("theta_long"))
    val belowTheta = ska.filter($"u" < d.getAs[Long]("theta_long")).count()
    assert(d.getAs[Long]("n_cand") + i.getAs[Long]("n_cand") == belowTheta)
  }

  test("exact-mode difference is the exact |A \\ B|; empty difference keeps its zero row") {
    import spark.implicits._
    val a = (0L until 100L).toDF("v")
    val b = (60L until 160L).toDF("v")
    val row = Kmv.differenceEstimate(
      Kmv.sketch(a, Nil, "v", k = 256),
      Kmv.sketch(b, Nil, "v", k = 256), k = 256).head
    assert(row.getAs[Long]("n_cand") == 60L)
    assert(row.getAs[Double]("est_diff") == 60.0)
    // A ⊆ B → empty difference, but exactly one zero row comes back
    val sub = Kmv.differenceEstimate(
      Kmv.sketch((10L until 50L).toDF("v"), Nil, "v", k = 256),
      Kmv.sketch((0L until 100L).toDF("v"), Nil, "v", k = 256), k = 256)
    assert(sub.count() == 1)
    val r = sub.head
    assert(r.getAs[Long]("n_cand") == 0L)
    assert(r.getAs[Double]("est_diff") == 0.0)
  }

  test("string keys sketch through the md5-52-bit surrogate, never empty") {
    import spark.implicits._
    // exact mode: below k the sketch IS the set — a silent cast-to-NULL
    // would have returned estimate 0 here (the round-10 latent finding)
    val small = (0 until 100).map(i => ("g", s"user_$i")).toDF("grp", "v")
    val est = Kmv.estimateFromSketch(
      Kmv.sketch(small, Seq("grp"), "v", k = 256), Seq("grp"), 256)
      .head.getDouble(1)
    assert(est == 100.0, s"string-keyed exact-mode estimate was $est")
    // estimation mode stays inside the k-error band
    val big = (0 until 20000).map(i => ("g", s"user_$i")).toDF("grp", "v")
    val estBig = Kmv.estimateFromSketch(
      Kmv.sketch(big, Seq("grp"), "v", k = 256), Seq("grp"), 256)
      .head.getDouble(1)
    assert(math.abs(estBig - 20000) / 20000.0 < 0.19, s"est=$estBig")
  }

  test("unsupported key types are refused with a typed error, not an empty sketch") {
    import spark.implicits._
    val dbl = Seq(("g", 1.5), ("g", 2.5)).toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      Kmv.sketch(dbl, Seq("grp"), "v", k = 64)
    }
    assert(e.getMessage.contains("no sketch key"))
  }
}
