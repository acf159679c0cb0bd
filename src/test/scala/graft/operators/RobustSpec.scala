package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RobustSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scalar reference: (med2, mad4, mad_z, is_outlier) per value. */
  private def ref(xs: Seq[Long], k: Int = 7)
      : Seq[(Long, Long, Long, Option[Double], Boolean)] = {
    def median2(vs: Seq[Long]): Long = {
      // 2*median of integer observations — exact midpoint arithmetic
      val s = vs.sorted
      val n = s.size
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val med2 = median2(xs)
    val d2s = xs.map(x => math.abs(2 * x - med2))
    val mad4 = median2(d2s)
    xs.map { x =>
      val d2 = math.abs(2 * x - med2)
      val z = if (mad4 > 0)
        Some(math.signum((2 * x - med2).toDouble) * (d2 * 2) / mad4)
      else None
      (x, med2, mad4, z, d2 * 4 > mad4.toLong * k)
    }
  }

  private def run(xs: Seq[Long], group: String = "g")
      : Seq[(Long, Long, Long, Option[Double], Boolean)] = {
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (x, i) => (group, i, x) }
      .toDF("g", "i", "n")
    Robust.madOutliers(df, Seq("g"), "n")
      .select($"n", $"med2", $"mad4", $"mad_z", $"is_outlier")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
      .sortBy(t => (t._1, t._4.getOrElse(0.0)))
  }

  test("matches the scalar reference (odd count, mixed deviations)") {
    val xs = Seq(10L, 12L, 11L, 9L, 50L, 10L, 8L)
    assert(run(xs).toSet === ref(xs).toSet)
  }

  test("matches the scalar reference (even count, half-integer median)") {
    val xs = Seq(3L, 8L, 15L, 4L, 100L, 6L)
    assert(run(xs).toSet === ref(xs).toSet)
    // sorted middles are 6 and 8: median 7, carried exactly as med2 = 14
    assert(ref(xs).head._2 === 14L)
  }

  test("masking: one extreme day flags under MAD where z-score hides it") {
    // a single huge outlier among n points caps its own z at ~sqrt(n-1)
    // (it inflates the σ it is scored against): 12 quiet days + 1 spike
    // give z ≈ sqrt(12) ≈ 3.46 < 3.5 no matter HOW large the spike —
    // the moment monitor is blind by construction. MAD (50% breakdown)
    // flags it unambiguously.
    val xs = (1L to 12L).map(i => 95L + (i % 11)) :+ 1000000L
    val n = xs.size
    val mean = xs.sum.toDouble / n
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    assert((xs.max - mean) / sd < 3.5, "fixture must exhibit z-masking")
    val got = run(xs)
    val spike = got.find(_._1 == 1000000L).get
    assert(spike._5, "MAD must flag the masked spike")
    assert(spike._4.get > 100.0)
    // quiet days unflagged
    assert(got.filter(_._1 < 1000L).forall(!_._5))
  }

  test("MAD = 0 degenerate regime: NULL score, any-deviation flag") {
    val xs = Seq(5L, 5L, 5L, 5L, 9L)
    val got = run(xs)
    assert(got.forall(_._3 == 0L)) // mad4 = 0
    assert(got.forall(_._4.isEmpty))
    assert(got.count(_._5) === 1) // only the 9 deviates
    assert(got.find(_._1 == 9L).get._5)
  }

  test("single observation flags nothing") {
    val got = run(Seq(42L))
    assert(got === Seq((42L, 84L, 0L, None, false)))
  }

  test("partition-layout invariance (bit-identical scores)") {
    import spark.implicits._
    val xs = (1L to 500L).map(i => (i * i * 31) % 400)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "i", "n")
    def dump(d: org.apache.spark.sql.DataFrame) =
      Robust.madOutliers(d, Seq("g"), "n")
        .select($"i", $"mad_z", $"is_outlier").collect()
        .map(r => (r.getInt(0),
          if (r.isNullAt(1)) null else java.lang.Double
            .doubleToLongBits(r.getDouble(1)), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    assert(dump(df.repartition(1)) === dump(df.repartition(17, $"n")))
  }

  test("non-integral value column is refused") {
    import spark.implicits._
    val df = Seq(("g", 1.5)).toDF("g", "n")
    val e = intercept[IllegalArgumentException] {
      Robust.madOutliers(df, Seq("g"), "n")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("winsorize matches the exact-percentile scalar reference") {
    import spark.implicits._
    // the (n-1)-index interpolation rule both engines implement
    def pct(sorted: Seq[Double], p: Double): Double = {
      val idx = p * (sorted.size - 1)
      val lo = math.floor(idx).toInt; val hi = math.ceil(idx).toInt
      sorted(lo) + (sorted(hi) - sorted(lo)) * (idx - lo)
    }
    val xs = (1 to 200).map(i => ((i * 37) % 199 + 1).toDouble)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "i", "v")
    val got = Robust.winsorize(df, Seq("g"), "v", 0.05, 0.95)
      .select($"i", $"p_lo", $"p_hi", $"value_w").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    val s = xs.sorted
    val (lo, hi) = (pct(s, 0.05), pct(s, 0.95))
    got.foreach { case (i, pl, ph, w) =>
      assert(pl === lo && ph === hi)
      assert(w === math.max(lo, math.min(hi, xs(i))))
    }
    // tails actually clamp, interior untouched
    assert(got.exists { case (i, _, _, w) => w != xs(i) })
    assert(got.count { case (i, _, _, w) => w == xs(i) } > 150)
  }

  test("winsorize: NULLs stay NULL (explicit guard); bad bounds refused") {
    import spark.implicits._
    val df = Seq(("a", 0, Some(1.0)), ("a", 1, None), ("a", 2, Some(100.0)),
      ("a", 3, Some(50.0)), ("b", 4, None), ("b", 5, None))
      .toDF("g", "i", "v")
    val got = Robust.winsorize(df, Seq("g"), "v", 0.25, 0.75)
      .select($"i", $"value_w").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(got(1) === None)
    assert(got(4) === None && got(5) === None)
    // group a non-null values (1, 50, 100): p25 = 25.5, p75 = 75 — the
    // tails clamp to the band
    assert(got(0) === Some(25.5) && got(2) === Some(75.0))
    assert(got(3) === Some(50.0))
    intercept[IllegalArgumentException] {
      Robust.winsorize(df, Seq("g"), "v", 0.9, 0.1)
    }
  }

  test("multiple groups score independently") {
    import spark.implicits._
    val a = Seq(1L, 2L, 3L, 100L).map(("a", _))
    val b = Seq(50L, 51L, 52L, 53L).map(("b", _))
    val df = (a ++ b).zipWithIndex
      .map { case ((g, x), i) => (g, i, x) }.toDF("g", "i", "n")
    val got = Robust.madOutliers(df, Seq("g"), "n")
      .select($"g", $"n", $"is_outlier").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got.contains(("a", 100L, true)))
    assert(got.filter(_._1 == "b").forall(!_._3))
  }

  /** Scalar CUSUM reference: the literal Page recursion in ×n units. */
  private def cusumRef(xs: Seq[Long], slack: Long): Seq[Long] = {
    val n = xs.size.toLong
    val sx = xs.sum
    xs.scanLeft(0L) { (s, x) =>
      math.max(0L, s + (n * x - sx - n * slack))
    }.tail
  }

  test("cusumShift == the literal Page recursion, any layout") {
    import spark.implicits._
    val xs = Seq(10L, 12L, 9L, 11L, 30L, 31L, 29L, 32L, 10L, 11L)
    for (parts <- Seq(1, 7)) {
      val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
        .toDF("g", "i", "x").repartition(parts)
      val got = Robust.cusumShift(df, Seq("g"), "i", "x",
          slack = 1L, threshold = 5L)
        .orderBy($"i").select($"cusum").as[Long].collect().toSeq
      assert(got === cusumRef(xs, slack = 1L), s"parts=$parts")
    }
  }

  test("a sustained small shift alarms CUSUM while staying invisible " +
      "to the point-wise MAD monitor") {
    import spark.implicits._
    // 20 noisy-quiet days around 100 (±6 spread keeps the MAD wide),
    // then 10 days shifted +13: each shifted day sits ~2 MAD from the
    // median (cutoff 3.5 — invisible point-wise), but the shift
    // SUSTAINS, so CUSUM accumulates it and alarms
    def noise(i: Int) = ((i * 3) % 13) - 6
    val xs = (0 until 20).map(i => 100L + noise(i)) ++
      (0 until 10).map(i => 113L + noise(i))
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "i", "x").repartition(4)
    val mad = Robust.madOutliers(df, Seq("g"), "x")
      .select(col("is_outlier")).collect().map(_.getBoolean(0))
    assert(!mad.exists(identity), "no single day is a MAD outlier")
    val cu = Robust.cusumShift(df, Seq("g"), "i", "x",
        slack = 5L, threshold = 25L)
      .orderBy(col("i")).select(col("alarm")).collect()
      .map(_.getBoolean(0))
    // alarms must equal the scalar model's verdicts exactly...
    val ref = cusumRef(xs, 5L).map(_ > xs.size.toLong * 25L)
    assert(cu.toSeq === ref)
    // ...and the model's shape is the story: quiet prefix silent,
    // sustained shift alarming by the tail
    assert(cu.takeRight(3).forall(identity),
      "the sustained shift must alarm by its tail")
    assert(!cu.take(20).exists(identity),
      "the quiet prefix must not alarm")
  }

  test("cusumShift's 2^61 numerator bound is checked: over-bound groups " +
      "error, never wrap") {
    import spark.implicits._
    // three huge counts put n*(2*sum|x| + n*slack) over 2^61 with three
    // rows — no data-sized input needed to hit the guard
    val big = Long.MaxValue / 4
    val df = Seq(("g", 1, big), ("g", 2, big), ("g", 3, big))
      .toDF("g", "i", "x")
    val e = intercept[Exception] {
      Robust.cusumShift(df, Seq("g"), "i", "x", slack = 0L,
        threshold = 1L).collect()
    }
    val full = org.apache.commons.lang3.exception.ExceptionUtils.getStackTrace(e)
    assert(full.contains("cusumShift numerator overflow"),
      s"got: ${e.getMessage}")
    // under the bound the same shape still computes (and the alarm math
    // is the scalar model's)
    val ok = Seq(("g", 1, 1000000000L), ("g", 2, 1000000000L),
      ("g", 3, 3000000000L)).toDF("g", "i", "x")
    val got = Robust.cusumShift(ok, Seq("g"), "i", "x", slack = 0L,
        threshold = 1L).orderBy($"i").select($"cusum").as[Long]
      .collect().toSeq
    assert(got === cusumRef(Seq(1000000000L, 1000000000L, 3000000000L), 0L))
  }

  test("cusumAgainst == the explicit-target recursion") {
    import spark.implicits._
    val xs = Seq(10L, 12L, 9L, 30L, 31L, 8L, 9L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "i", "x").repartition(3)
    val got = Robust.cusumAgainst(df, Seq("g"), "i", "x",
        target = 10L, slack = 1L, threshold = 15L)
      .orderBy($"i").select($"cusum", $"alarm").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val ref = xs.scanLeft(0L)((s, x) => math.max(0L, s + x - 10L - 1L)).tail
    assert(got === ref.map(s => (s, s > 15L)))
  }

  test("cusumShiftStream ≡ cusumAgainst with the shift straddling " +
      "micro-batches") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    def t(i: Int) = new java.sql.Timestamp(1718000000000L + i * 60000L)
    // quiet first file, sustained shift split across both files: the
    // alarm only fires if S carries across the batch boundary
    val rows = (0 until 8).map(i => (1L, t(i), i.toLong, 10L)) ++
      (8 until 12).map(i => (1L, t(i), i.toLong, 18L)) ++ // shift starts
      (12 until 16).map(i => (1L, t(i), i.toLong, 18L))   // second file
    val streamDir = Files.createTempDirectory("cusum_stream").toString
    def writeFile(part: Seq[(Long, java.sql.Timestamp, Long, Long)],
                  name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("cusum_tmp").toString
      part.toDF("k", "ts", "id", "x").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val p = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(s => s.endsWith(".parquet") && s.contains("part-")).head
      val dst = Paths.get(streamDir, name)
      Files.copy(Paths.get(p), dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
      ()
    }
    writeFile(rows.take(12), "0000.parquet", 1718000000000L)
    writeFile(rows.drop(12), "0001.parquet", 1718000100000L)
    val batch = Robust.cusumAgainst(
        rows.toDF("k", "ts", "id", "x"), Seq("k"), "id", "x",
        target = 10L, slack = 2L, threshold = 30L)
      .select($"id", $"cusum", $"alarm").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    val sch = rows.toDF("k", "ts", "id", "x").schema
    val src = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    val out = scala.collection.mutable.Map.empty[Long, (Long, Boolean)]
    val q = Robust.cusumShiftStream(src, "k", "ts", "id", "x",
        target = 10L, slack = 2L, threshold = 30L)
      .select($"id", $"cusum", $"alarm")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("cusum_ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rs = df.collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
        out.synchronized { out ++= rs }
        ()
      }
      .start()
    q.awaitTermination(120000)
    assert(out.toMap === batch)
    // and the alarm genuinely fires in the SECOND file's rows only
    assert(batch(15L)._2 && !batch(11L)._2,
      "the shift must alarm after the boundary, proving carried state")
  }

  test("cusum resets after the series returns to target") {
    import spark.implicits._
    // symmetric: high burst then equally low stretch — prefix-min
    // resets S to 0 afterward
    val xs = Seq(10L, 10L, 20L, 20L, 0L, 0L, 10L, 10L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "i", "x")
    val got = Robust.cusumShift(df, Seq("g"), "i", "x",
        slack = 0L, threshold = 100L)
      .orderBy(col("i")).select(col("cusum")).collect().map(_.getLong(0))
    assert(got === cusumRef(xs, 0L).toArray)
    assert(got.last === 0L, "a balanced tail must decay back to zero")
  }

  /** Scalar truncated-EWMA with the EXACT association order the engine
    * folds: left-to-right term sums, left-folded weight products.
    */
  private def ewmaRef(xs: Seq[Option[Double]], from: Int, until: Int,
                      t: Int, decay: Double): Option[Double] = {
    def pw(i: Int) = Seq.fill(i)(decay).foldLeft(1.0)(_ * _)
    val idx = (from until until)
    val num = idx.map { i =>
      if (t - i >= 0 && xs(t - i).isDefined) pw(i) * xs(t - i).get else 0.0
    }.reduce(_ + _)
    val den = idx.map { i =>
      if (t - i >= 0 && xs(t - i).isDefined) pw(i) else 0.0
    }.reduce(_ + _)
    if (den > 0.0) Some(num / den) else None
  }

  test("ewmaSmoothed matches the scalar truncated model at round-6, " +
      "alarms on a planted spike, never alarms without history, and " +
      "passes NULL observations through") {
    import spark.implicits._
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs: Seq[Option[Double]] =
      Seq(Some(10.0), Some(11.0), Some(9.0), None, Some(10.0), Some(100.0))
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x.map(_.toLong)) }
      .toDF("g", "i", "x")
    val got = Robust.ewmaSmoothed(df, Seq("g"), "i", "x",
        alpha = 0.3, lookback = 8, relBand = 0.5)
      .orderBy(col("i"))
      .select(col("ewma"), col("prior_ewma"), col("dev"), col("alarm"))
      .collect()
    xs.indices.foreach { t =>
      val wantE = ewmaRef(xs, 0, 8, t, 0.7).map(r6)
      val wantP = ewmaRef(xs, 1, 9, t, 0.7).map(r6)
      val gotE = if (got(t).isNullAt(0)) None else Some(got(t).getDouble(0))
      val gotP = if (got(t).isNullAt(1)) None else Some(got(t).getDouble(1))
      assert(gotE === wantE, s"ewma at t=$t")
      assert(gotP === wantP, s"prior at t=$t")
      val wantD = for (x <- xs(t); p <- ewmaRef(xs, 1, 9, t, 0.7))
        yield r6(x - p)
      val gotD = if (got(t).isNullAt(2)) None else Some(got(t).getDouble(2))
      assert(gotD === wantD, s"dev at t=$t")
    }
    assert(!got(0).getBoolean(3), "no history => no alarm")
    assert(!got(3).getBoolean(3), "a NULL observation cannot alarm")
    assert(got(5).getBoolean(3), "the 10x spike must alarm")
    assert(!got(4).getBoolean(3), "steady state must not alarm")
  }

  test("ewmaSmoothedStream ≡ ewmaSmoothed with the drift straddling " +
      "micro-batches and a NULL observation in the history") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    def t(i: Int) = new java.sql.Timestamp(1718000000000L + i * 60000L)
    // steady, one NULL, then a drift whose window straddles both files:
    // the smooth only matches the batch if the value HISTORY (incl. the
    // null's lag slot) carries across the boundary
    val rows: Seq[(Long, java.sql.Timestamp, Long, Option[Long])] =
      (0 until 6).map(i => (1L, t(i), i.toLong, Some(10L))) ++
        Seq((1L, t(6), 6L, Option.empty[Long])) ++
        (7 until 10).map(i => (1L, t(i), i.toLong, Some(30L))) ++
        (10 until 14).map(i => (1L, t(i), i.toLong, Some(30L)))
    val streamDir = Files.createTempDirectory("ewma_stream").toString
    def writeFile(part: Seq[(Long, java.sql.Timestamp, Long, Option[Long])],
                  name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("ewma_tmp").toString
      part.toDF("k", "ts", "id", "x").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val p = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(s => s.endsWith(".parquet") && s.contains("part-")).head
      val dst = Paths.get(streamDir, name)
      Files.copy(Paths.get(p), dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
      ()
    }
    writeFile(rows.take(10), "0000.parquet", 1718000000000L)
    writeFile(rows.drop(10), "0001.parquet", 1718000100000L)
    def key(r: org.apache.spark.sql.Row): (Long, Option[Double], Option[Double], Option[Double], Boolean) =
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4))
    val batch = Robust.ewmaSmoothed(rows.toDF("k", "ts", "id", "x"),
        Seq("k"), "id", "x")
      .select($"id", $"ewma", $"prior_ewma", $"dev", $"alarm")
      .collect().map(key).map(t => t._1 -> t).toMap
    val sch = rows.toDF("k", "ts", "id", "x").schema
    val src = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    val out = scala.collection.mutable.Map
      .empty[Long, (Long, Option[Double], Option[Double], Option[Double], Boolean)]
    val q = Robust.ewmaSmoothedStream(src, "k", "ts", "id", "x")
      .select($"id", $"ewma", $"prior_ewma", $"dev", $"alarm")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("ewma_ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rs = df.collect().map(key).map(t => t._1 -> t)
        out.synchronized { out ++= rs }
        ()
      }
      .start()
    q.awaitTermination(120000)
    assert(out.toMap === batch)
    // the drift genuinely alarms in the SECOND file's rows too — the
    // carried history, not a fresh window, is what it is judged against
    assert(batch(7L)._5, "the first drift row must alarm")
    assert(batch(13L)._5 === (math.abs(batch(13L)._4.get) >
      0.5 * math.abs(batch(13L)._3.get)))
  }
}
