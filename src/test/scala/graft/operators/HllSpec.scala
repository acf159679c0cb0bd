package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("codegen splitmix64/leading_zeros64 match their scalar references") {
    import spark.implicits._
    val vals = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      0x9e3779b97f4a7c15L) ++ (1 to 100).map(i => i * 2654435761L)
    val got = vals.toDF("v")
      .select($"v", graft.functions.SplitMix64.splitmix64($"v").as("h"),
        graft.functions.SplitMix64.leading_zeros64($"v").as("z"))
      .collect()
    got.foreach { r =>
      val v = r.getLong(0)
      assert(r.getLong(1) == graft.functions.SplitMix64.hash(v), s"hash($v)")
      assert(r.getInt(2) == java.lang.Long.numberOfLeadingZeros(v), s"clz($v)")
    }
  }

  test("estimate lands within the 1.04/sqrt(m) error band across cardinalities") {
    import spark.implicits._
    // one group per target cardinality; values disjoint across groups
    val groups = Seq(100L, 5000L, 50000L)
    val rows = groups.zipWithIndex.flatMap { case (n, g) =>
      (0L until n).map(i => (s"g$g", g * 10000000L + i))
    }
    val est = Hll.estimate(rows.toDF("grp", "v"), Seq("grp"), "v", p = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    groups.zipWithIndex.foreach { case (n, g) =>
      val rel = math.abs(est(s"g$g") - n) / n.toDouble
      // 1.04/sqrt(4096) = 1.6%; allow 3 sigma
      assert(rel < 0.05, s"n=$n est=${est(s"g$g")} rel=$rel")
    }
  }

  test("register frames merge by register-wise max (sketch mergeability)") {
    import spark.implicits._
    val a = (0L until 3000L).map(i => ("g", i)).toDF("grp", "v")
    val b = (1500L until 6000L).map(i => ("g", i)).toDF("grp", "v") // overlap
    val direct = Hll.estimate(a.unionByName(b), Seq("grp"), "v").head.getDouble(1)
    val merged = Hll.estimateFromRegisters(
      Hll.mergeRegisters(
        Hll.registers(a, Seq("grp"), "v")
          .unionByName(Hll.registers(b, Seq("grp"), "v")),
        Seq("grp")),
      Seq("grp")).head.getDouble(1)
    assert(direct == merged, s"direct=$direct merged=$merged")
    // merges compose: merging a merged frame with a third frame is the
    // same as the three-way one-shot
    val c = (4000L until 9000L).map(i => ("g", i)).toDF("grp", "v")
    val direct3 = Hll.estimate(a.unionByName(b).unionByName(c),
      Seq("grp"), "v").head.getDouble(1)
    val merged3 = Hll.estimateFromRegisters(
      Hll.mergeRegisters(
        Hll.mergeRegisters(
          Hll.registers(a, Seq("grp"), "v")
            .unionByName(Hll.registers(b, Seq("grp"), "v")), Seq("grp"))
          .unionByName(Hll.registers(c, Seq("grp"), "v")),
        Seq("grp")),
      Seq("grp")).head.getDouble(1)
    assert(direct3 == merged3, s"direct=$direct3 merged=$merged3")
  }

  test("NULL values do not count and an all-NULL group yields no estimate") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None), ("b", None))
      .map { case (g, v) => (g, v.map(Long.box).orNull) }.toDF("grp", "v")
    val est = Hll.estimate(df, Seq("grp"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(!est.contains("b"), "an all-NULL group must not appear")
    val clean = Hll.estimate(
      Seq(("a", 1L), ("a", 2L)).toDF("grp", "v"), Seq("grp"), "v")
      .head.getDouble(1)
    assert(est("a") == clean, "NULLs must not perturb the registers")
  }

  test("small cardinalities take the linear-counting branch exactly") {
    import spark.implicits._
    // n distinct values with no bucket collisions -> V = m - n and the
    // estimate is m*ln(m/V), checked against the closed form
    val n = 10
    val est = Hll.estimate((0L until n.toLong).map(("g", _)).toDF("grp", "v"),
      Seq("grp"), "v", p = 12).head.getDouble(1)
    val m = 4096.0
    // buckets could collide; recompute V from the register frame instead
    val v = m - Hll.registers((0L until n.toLong).map(("g", _)).toDF("grp", "v"),
      Seq("grp"), "v", p = 12).count()
    assert(est == m * math.log(m / v), s"est=$est")
  }

  test("cumulativeEstimate: each period equals the one-shot estimate over " +
      "its prefix, including periods that add nothing new") {
    import spark.implicits._
    // period 1: values 0..49; period 2: no new values (repeats);
    // period 3: 50 more — the repeat period must HOLD the estimate
    val rows = (0L until 50L).map((1, _)) ++ (0L until 50L).map((2, _)) ++
      (0L until 100L).map((3, _))
    val df = rows.toDF("per", "v").repartition(8)
    val cum = Hll.cumulativeEstimate(df, "per", "v")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    def oneShot(upTo: Int): Double =
      Hll.estimate(df.filter($"per" <= upTo).withColumn("g", lit("g")),
        Seq("g"), "v").head.getDouble(1)
    assert(cum(1) == oneShot(1))
    assert(cum(2) == oneShot(2))
    assert(cum(3) == oneShot(3))
    assert(cum(1) == cum(2)) // nothing new -> identical registers
    assert(cum(3) > cum(2))
  }

  test("string keys estimate through the md5-52-bit surrogate, never zero") {
    import spark.implicits._
    // a silent cast-to-NULL would have produced empty registers and a
    // 0 estimate here (the round-10 latent finding)
    val df = (0 until 50000).map(i => ("g", s"user_$i")).toDF("grp", "v")
    val est = Hll.estimate(df, Seq("grp"), "v").head.getDouble(1)
    assert(math.abs(est - 50000) / 50000.0 < 0.06, s"est=$est")
    val e = intercept[IllegalArgumentException] {
      Hll.registers(Seq(("g", 1.5)).toDF("grp", "v"), Seq("grp"), "v")
    }
    assert(e.getMessage.contains("no sketch key"))
  }
}
