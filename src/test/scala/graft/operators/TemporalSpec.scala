package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(us: Long) = timestamp_micros(lit(us))

  test("asof backward: latest right at-or-before, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, 1000L), // matches right id=11 (ts 1000, inclusive)
      (101L, 1L, 1500L), // matches right id=11 (still latest <= 1500)
      (102L, 1L, 500L),  // no right row at or before -> null
      (103L, 2L, 9999L)) // key with no right rows -> null
      .toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val right = Seq(
      (10L, 1L, 800L),
      (11L, 1L, 1000L), // equal-ts tie with id=12? no: larger id below
      (12L, 1L, 1000L)) // same ts as 11 -> larger event_id must win
      .toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val got = Temporal.asofJoinBackward(left, right, "user_id", "ts", "ts", "event_id")
      .select($"event_id", $"asof.event_id".as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(100L) == Some(12L)) // inclusive + tie -> largest event_id
    assert(got(101L) == Some(12L))
    assert(got(102L) == None)
    assert(got(103L) == None)
  }

  test("asof forward: earliest right at-or-after, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, 1000L), // matches right id=11 (ts 1000, inclusive, min id)
      (101L, 1L, 900L),  // matches right id=11 (earliest >= 900)
      (102L, 1L, 1500L), // no right row at or after -> null
      (103L, 2L, 1L))    // key with no right rows -> null
      .toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val right = Seq(
      (10L, 1L, 800L),
      (12L, 1L, 1000L), // same ts as 11 -> SMALLER event_id must win
      (11L, 1L, 1000L))
      .toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val got = Temporal.asofJoinForward(left, right, "user_id", "ts", "ts", "event_id")
      .select($"event_id", $"asof.event_id".as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(100L) == Some(11L)) // inclusive + tie -> smallest event_id
    assert(got(101L) == Some(11L))
    assert(got(102L) == None)
    assert(got(103L) == None)
  }

  test("asof forward == brute-force model on random data (5 seeds)") {
    import spark.implicits._
    val rng0 = 192837465L
    (1 to 5).foreach { round =>
      def rows(n: Int, salt: Long): Seq[(Long, Long, Long)] =
        (1 to n).map { i =>
          var x = rng0 + round * 1013904223L + salt * 69069L + i * 2654435761L
          x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
          val key = math.floorMod(x, 4).toLong
          val ts = math.floorMod(x >>> 8, 30).toLong * 1000L
          (i.toLong + salt, key, ts)
        }
      val lRows = rows(40, 0)
      val rRows = rows(50, 1000)
      val left = lRows.toDF("event_id", "user_id", "us")
        .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
      val right = rRows.toDF("event_id", "user_id", "us")
        .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
      val got = Temporal.asofJoinForward(left, right, "user_id", "ts", "ts", "event_id")
        .select($"event_id", $"asof.event_id".as("m"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      // model: earliest right with same key, ts >= left ts; ties -> min event_id
      val want = lRows.map { case (lid, lk, lts) =>
        val cands = rRows.filter { case (_, rk, rts) => rk == lk && rts >= lts }
        lid -> (if (cands.isEmpty) None
                else Some(cands.minBy(c => (c._3, c._1))._1))
      }.toMap
      assert(got == want, s"round=$round diff=${
        want.keySet.filter(k => got.get(k) != want.get(k)).take(5)}")
    }
  }

  test("sessionIndex: gap strictly greater than threshold starts a session") {
    import spark.implicits._
    val e = Seq(
      (1L, 7L, 0L),           // session 1
      (2L, 7L, 1000L),        // +1000us gap <= 1000 -> same session
      (3L, 7L, 2001L),        // +1001 > 1000 -> session 2
      (4L, 8L, 5L))           // other key -> its own session 1
      .toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val got = Temporal.sessionIndex(e, "user_id", "ts", "event_id", gapMicros = 1000L)
      .select($"event_id", $"_session")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("rangeCount: half-open window [t-w, t), zero-preserving left join") {
    import spark.implicits._
    val left = Seq((1L, 7L, 1000L), (2L, 7L, 5000L), (3L, 9L, 100L))
      .toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val right = Seq(
      (7L, 900L),   // in [0,1000) for left 1; in [4000,5000)? no
      (7L, 1000L),  // equal to left-1 ts -> EXCLUDED (half-open)
      (7L, 4500L),  // in window of left 2
      (8L, 950L))   // other key
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val got = Temporal.rangeCount(left, right, "user_id", "ts", "ts",
      windowMicros = 1000L, asCol = "n")
      .select($"event_id", $"n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("sessionAggregate: strict-gap merge semantics, per-key sessions") {
    import spark.implicits._
    val sec = 1000000L
    val e = Seq(
      (7L, 0L), (7L, 5 * sec), (7L, 9 * sec), // one session (gaps < 10s)
      (7L, 19 * sec),  // exactly 10s after 9s: touching windows MERGE
      (7L, 30 * sec),  // 11s after 19s -> new session
      (8L, 0L))        // other key
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val got = Temporal.sessionAggregate(e, "user_id", "ts", "10 seconds")
      .select($"user_id", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((7L, 1L), (7L, 4L), (8L, 1L)))
  }

  test("sessionAggregate streaming: closed sessions emit in append mode") {
    import java.nio.file.Files
    import spark.implicits._
    val ledger = Files.createTempDirectory("ledger").toString
    val sec = 1000L // wire ts_ms is millis
    graft.sources.Ledger.writeSegment(ledger, "hrdb", "employees", "000001.jsonl", Seq(
      graft.cdc.Fixtures.env("employees", "c", "null", graft.cdc.Fixtures.emp(id = 1), graft.cdc.Fixtures.T0),
      graft.cdc.Fixtures.env("employees", "c", "null", graft.cdc.Fixtures.emp(id = 2), graft.cdc.Fixtures.T0 + 5 * sec),
      graft.cdc.Fixtures.env("employees", "c", "null", graft.cdc.Fixtures.emp(id = 3), graft.cdc.Fixtures.T0 + 8 * sec),
      // far-future lone event advances the watermark past the first session
      graft.cdc.Fixtures.env("employees", "c", "null", graft.cdc.Fixtures.emp(id = 9), graft.cdc.Fixtures.T0 + 3600 * sec)))
    val wire = spark.readStream.format("graft-changelog").option("path", ledger).load()
      .select($"table", timestamp_millis($"ts_ms").as("ts"))
      .withWatermark("ts", "1 minute")
    val sessions = Temporal.sessionAggregate(wire, "table", "ts", "30 seconds")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = sessions.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= df.select("table", "n_events").collect()
            .map(r => (r.getString(0), r.getLong(1)))
        }
        ()
      }
      .start()
    q.awaitTermination(120000)
    // only the CLOSED first session (3 events within 30s gaps) is emitted;
    // the far-future event's session is still open at end of input
    assert(out.toSeq == Seq(("employees", 3L)))
  }

  test("asof backward == brute-force model on random data (5 seeds)") {
    import spark.implicits._
    val rng0 = 987654321L
    (1 to 5).foreach { round =>
      // deterministic pseudo-random rows: (id, key, ts) with ts collisions
      // made likely (small ts range) to stress the tie rule
      def rows(n: Int, salt: Long): Seq[(Long, Long, Long)] =
        (1 to n).map { i =>
          var x = rng0 + round * 1013904223L + salt * 69069L + i * 2654435761L
          x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
          val key = math.floorMod(x, 4).toLong
          val ts = math.floorMod(x >>> 8, 30).toLong * 1000L
          (i.toLong + salt, key, ts)
        }
      val lRows = rows(40, 0)
      val rRows = rows(50, 1000)
      val left = lRows.toDF("event_id", "user_id", "us")
        .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
      val right = rRows.toDF("event_id", "user_id", "us")
        .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
      val got = Temporal.asofJoinBackward(left, right, "user_id", "ts", "ts", "event_id")
        .select($"event_id", $"asof.event_id".as("m"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      // model: latest right with same key, ts <= left ts; ties -> max event_id
      val want = lRows.map { case (lid, lk, lts) =>
        val cands = rRows.filter { case (_, rk, rts) => rk == lk && rts <= lts }
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(c => (c._3, c._1))._1))
      }.toMap
      assert(got == want, s"round=$round diff=${
        want.keySet.filter(k => got.get(k) != want.get(k)).take(5)}")
    }
  }

  test("asof join plan has no nested-loop or cartesian product") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val plan = Temporal.asofJoinBackward(left, left, "user_id", "ts", "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"), plan)
  }

  test("salted asof join == plain asof join, including a 90%-hot-key corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // one viral key (0) holds ~90% of rows; 5 quiet keys share the rest
    def rows(n: Int, base: Long) = (0 until n).map { i =>
      val k = if (rnd.nextInt(10) < 9) 0L else 1L + rnd.nextInt(5)
      (base + i, k, rnd.nextInt(100000).toLong)
    }
    val left = rows(400, 0).toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val right = rows(300, 10000).toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"asof.event_id".as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val plain = key(Temporal.asofJoinBackward(left, right, "user_id", "ts", "ts", "event_id"))
    // bucketMicros chosen so the hot key spans many buckets
    val salted = key(Temporal.asofJoinBackwardSalted(left, right, "user_id",
      "ts", "ts", "event_id", bucketMicros = 10000L))
    assert(salted == plain)
    // balance: the partition unit is (key, bucket) - the hot key must split
    // across many units, each far below its total row count
    val units = left.unionByName(right)
      .filter($"user_id" === 0L)
      .groupBy((unix_micros($"ts") / 10000L).cast("long")).count()
      .collect().map(_.getLong(1))
    assert(units.length >= 8, s"hot key landed in only ${units.length} buckets")
    assert(units.max < units.sum / 2,
      s"one bucket still holds most of the hot key: ${units.max} of ${units.sum}")
  }

  test("salted FORWARD asof join == plain forward asof on the hot-key corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def rows(n: Int, base: Long) = (0 until n).map { i =>
      val k = if (rnd.nextInt(10) < 9) 0L else 1L + rnd.nextInt(5)
      (base + i, k, rnd.nextInt(100000).toLong)
    }
    val left = rows(400, 0).toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val right = rows(300, 10000).toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"asof.event_id".as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val plain = key(Temporal.asofJoinForward(left, right, "user_id",
      "ts", "ts", "event_id"))
    val salted = key(Temporal.asofJoinForwardSalted(left, right, "user_id",
      "ts", "ts", "event_id", bucketMicros = 10000L))
    assert(salted == plain)
  }

  test("salted sessionIndex == plain sessionIndex on skewed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 600).map { i =>
      val k = if (rnd.nextInt(10) < 9) 0L else 1L + rnd.nextInt(5)
      (i.toLong, k, rnd.nextInt(200000).toLong)
    }
    val e = rows.toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    def m(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"_session")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = m(Temporal.sessionIndex(e, "user_id", "ts", "event_id", gapMicros = 500L))
    val salted = m(Temporal.sessionIndexSalted(e, "user_id", "ts", "event_id",
      gapMicros = 500L, bucketMicros = 20000L))
    assert(salted == plain)
    // boundary case: gap exactly at a bucket edge, gap == threshold (same
    // session) and threshold+1 (new session) across the boundary
    val edge = Seq((1L, 5L, 19500L), (2L, 5L, 20500L), (3L, 5L, 21501L))
      .toDF("event_id", "user_id", "us")
      .select($"event_id", $"user_id", timestamp_micros($"us").as("ts"))
    val p2 = m(Temporal.sessionIndex(edge, "user_id", "ts", "event_id", gapMicros = 1000L))
    val s2 = m(Temporal.sessionIndexSalted(edge, "user_id", "ts", "event_id",
      gapMicros = 1000L, bucketMicros = 20000L))
    assert(p2 == s2 && p2 == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("rangeCount keeps duplicate left rows distinct (per-row contract)") {
    import spark.implicits._
    // two left rows identical on EVERY column must each emit their own count
    val left = Seq((7L, 1000L), (7L, 1000L), (7L, 5000L))
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val right = Seq((7L, 900L), (7L, 950L))
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val got = Temporal.rangeCount(left, right, "user_id", "ts", "ts",
      windowMicros = 600L)
      .select($"user_id", unix_micros($"ts").as("us"), $"n_in_range")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sorted
    assert(got == Seq((7L, 1000L, 2L), (7L, 1000L, 2L), (7L, 5000L, 0L)),
      s"got $got")
  }

  test("cohortRetention: first-day cohorts, same-day events collapse") {
    import spark.implicits._
    val day = 86400000000L // one day in micros
    val ev = Seq(
      (1L, 0L), (1L, 1000L),      // u1 day 0 twice (collapses)
      (1L, 2 * day),              // u1 active again day 2
      (2L, day), (2L, day + 5L),  // u2 cohort day 1
      (2L, 2 * day))              // u2 active day 2 (offset 1)
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val got = Temporal.cohortRetention(ev, "user_id", "ts")
      .select(date_format($"cohort_date", "yyyy-MM-dd").as("c"),
        $"offset_days", $"n_users")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .sorted
    assert(got == Seq(
      ("1970-01-01", 0L, 1L), ("1970-01-01", 2L, 1L),
      ("1970-01-02", 0L, 1L), ("1970-01-02", 1L, 1L)), s"got $got")
  }

  test("cohortRetention: offset-0 bucket equals cohort size on sf0.001") {
    import spark.implicits._
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val m = Temporal.cohortRetention(e, "user_id", "ts")
    val cohortSizes = e.groupBy($"user_id")
      .agg(min(to_date($"ts")).as("cohort_date"))
      .groupBy($"cohort_date").agg(count(lit(1)).as("n"))
    val mism = m.filter($"offset_days" === 0)
      .join(cohortSizes, Seq("cohort_date"))
      .filter($"n_users" =!= $"n").count()
    assert(mism == 0)
    // every user appears in offset 0 exactly once
    val total = m.filter($"offset_days" === 0)
      .agg(sum($"n_users")).collect()(0).getLong(0)
    assert(total == e.select($"user_id").distinct().count())
  }

  test("resampleWithFill: dense grid per key span, gaps carry the last " +
      "observed sum with n_obs = 0") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // key 1: days 0, 1, 4 observed (two obs on day 1) -> gaps on 2, 3
    // key 2: single day -> single-bin grid, no gaps
    val df = Seq(
      (1L, ts("1970-01-01 05:00:00"), 1.00),
      (1L, ts("1970-01-02 01:00:00"), 2.00),
      (1L, ts("1970-01-02 23:00:00"), 0.50),
      (1L, ts("1970-01-05 00:00:00"), 4.00),
      (2L, ts("1970-01-08 12:00:00"), 9.99))
      .toDF("k", "ts", "v").repartition(4)
    val got = Temporal.resampleWithFill(df, "k", "ts", "v", 86400000000L)
      .orderBy($"key", $"bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(got == List(
      (1L, 0L, 100L, 1L),
      (1L, 1L, 250L, 2L), // two observations summed (integer cents)
      (1L, 2L, 250L, 0L), // gap: carried forward
      (1L, 3L, 250L, 0L), // gap: carried forward
      (1L, 4L, 400L, 1L),
      (2L, 7L, 999L, 1L)))
    // grid size = per-key span, never the global [min, max] product
    assert(got.size == 6)
  }

  test("resampleInterpolate: gaps take the straight line between " +
      "observed neighbors; observed bins exact") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // key 1: days 0 (100c), 1 (250c), 4 (400c) -> days 2, 3 interpolated
    //   over the 1 -> 4 segment: 250 + (400-250) * i/3
    // key 2: single day -> single-bin grid, nothing to interpolate
    val df = Seq(
      (1L, ts("1970-01-01 05:00:00"), 1.00),
      (1L, ts("1970-01-02 01:00:00"), 2.00),
      (1L, ts("1970-01-02 23:00:00"), 0.50),
      (1L, ts("1970-01-05 00:00:00"), 4.00),
      (2L, ts("1970-01-08 12:00:00"), 9.99))
      .toDF("k", "ts", "v").repartition(4)
    val got = Temporal.resampleInterpolate(df, "k", "ts", "v", 86400000000L)
      .orderBy($"key", $"bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toList
    val seg = (i: Long) => 250.0 + (400.0 - 250.0) * i.toDouble / 3.0
    assert(got == List(
      (1L, 0L, 100.0, 1L),
      (1L, 1L, 250.0, 2L),
      (1L, 2L, seg(1), 0L), // 300.0
      (1L, 3L, seg(2), 0L), // 350.0
      (1L, 4L, 400.0, 1L),
      (2L, 7L, 999.0, 1L)))
  }

  test("resampleInterpolate: consecutive gaps across several segments " +
      "each use their own neighbors") {
    import spark.implicits._
    def day(i: Long) = java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plusSeconds(i * 86400 + 3600))
    // observed days 0 (0c), 2 (200c), 3 (50c), 6 (350c)
    val df = Seq(
      (1L, day(0), 0.00), (1L, day(2), 2.00),
      (1L, day(3), 0.50), (1L, day(6), 3.50))
      .toDF("k", "ts", "v")
    val got = Temporal.resampleInterpolate(df, "k", "ts", "v", 86400000000L)
      .orderBy($"bin").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toList
    assert(got == List(
      (0L, 0.0),
      (1L, 100.0),            // midpoint of 0 -> 200
      (2L, 200.0),
      (3L, 50.0),
      (4L, 50.0 + 300.0 / 3), // 3 -> 6 segment, step 100
      (5L, 50.0 + 600.0 / 3),
      (6L, 350.0)))
  }

  test("asofJoinBackwardTolerance: stale matches become NULL, fresh " +
      "matches identical to the unbounded join") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1718000000000L + min * 60000L)
    val left = Seq((1L, 10L, ts(20)), (1L, 11L, ts(60)), (2L, 20L, ts(5)))
      .toDF("k", "lid", "ts")
    val right = Seq((1L, 90L, ts(15)), (1L, 91L, ts(30)), (2L, 92L, ts(4)))
      .toDF("k", "rid", "rts")
    val got = Temporal.asofJoinBackwardTolerance(left, right, "k",
        "ts", "rts", "rid", toleranceUs = 10L * 60000000L)
      .select($"lid",
        when($"asof".isNotNull, $"asof.rid").as("rid"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(
      10L -> Some(90L), // 5 min old: within tolerance
      11L -> None,      // nearest (91 @30) is 30 min old: stale -> NULL
      20L -> Some(92L)))
    // the unbounded join would have matched lid 11 to rid 91
    val unbounded = Temporal.asofJoinBackward(left, right, "k",
        "ts", "rts", "rid")
      .filter($"lid" === 11L).head()
    assert(unbounded.getStruct(unbounded.fieldIndex("asof"))
      .getAs[Long]("rid") === 91L)
  }

  test("resampleInterpolate is partition-layout invariant") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("1970-01-01 05:00:00"), 1.37),
      (1L, ts("1970-01-04 01:00:00"), 8.02),
      (2L, ts("1970-01-02 00:00:00"), 3.14),
      (2L, ts("1970-01-07 12:00:00"), 0.01))
    val a = Temporal.resampleInterpolate(
      rows.toDF("k", "ts", "v").repartition(7), "k", "ts", "v",
      86400000000L).collect().toSet
    val b = Temporal.resampleInterpolate(
      rows.toDF("k", "ts", "v").coalesce(1), "k", "ts", "v",
      86400000000L).collect().toSet
    assert(a === b)
  }

  /** Scalar model of Spark's hopping-window assignment: the epoch-aligned
    * starts ≤ t with start + len > t.
    */
  private def hopWindowsOf(tUs: Long, lenUs: Long, slideUs: Long): Seq[Long] = {
    val last = Math.floorDiv(tUs, slideUs) * slideUs
    (0 until (lenUs / slideUs).toInt).map(i => last - i * slideUs)
      .filter(ws => ws + lenUs > tUs)
  }

  test("hoppingAggregate == scalar window-assignment model") {
    import spark.implicits._
    val lenUs = 3600L * 1000000L
    val slideUs = 900L * 1000000L
    // awkward offsets on purpose: nothing lands on a slide boundary
    val events = Seq(
      ("a", 1704067200000001L, 3L), ("a", 1704067201000000L, 5L),
      ("a", 1704069900000000L, 7L), // exactly on a slide boundary
      ("b", 1704067199999999L, 11L), ("b", 1704070800000017L, 13L))
    val df = events.map { case (k, t, v) => (k, t, v) }
      .toDF("k", "t_us", "v")
      .select($"k", timestamp_micros($"t_us").as("ts"), $"v")
    val got = Temporal.hoppingAggregate(df, "k", "ts", $"v",
        "1 hour", "15 minutes")
      .select($"k", unix_micros($"win_start").as("ws"), $"n", $"val_sum")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val expected = events
      .flatMap { case (k, t, v) =>
        hopWindowsOf(t, lenUs, slideUs).map(ws => (k, ws) -> v) }
      .groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
    assert(got == expected)
    // every event fans out to exactly len/slide = 4 windows
    assert(expected.values.map(_._1).sum == events.size * 4L)
  }

  test("hoppingAggregate streaming: windows past the watermark emit in append mode") {
    import java.nio.file.Files
    import spark.implicits._
    val ledger = Files.createTempDirectory("ledger").toString
    val sec = 1000L
    val base = graft.cdc.Fixtures.T0
    graft.sources.Ledger.writeSegment(ledger, "hrdb", "employees", "000001.jsonl", Seq(
      graft.cdc.Fixtures.env("employees", "c", "null", graft.cdc.Fixtures.emp(id = 1), base),
      graft.cdc.Fixtures.env("employees", "c", "null", graft.cdc.Fixtures.emp(id = 2), base + 5 * sec),
      graft.cdc.Fixtures.env("employees", "c", "null", graft.cdc.Fixtures.emp(id = 3), base + 8 * sec),
      // far-future lone event advances the watermark past the early windows
      graft.cdc.Fixtures.env("employees", "c", "null", graft.cdc.Fixtures.emp(id = 9), base + 3600 * sec)))
    val wire = spark.readStream.format("graft-changelog").option("path", ledger).load()
      .select($"table", timestamp_millis($"ts_ms").as("ts"))
      .withWatermark("ts", "1 minute")
    val hops = Temporal.hoppingAggregate(wire, "table", "ts", lit(1L),
      "30 seconds", "10 seconds")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = hops.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= df.select(unix_micros($"win_start"), $"n").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .start()
    q.awaitTermination(120000)
    // the three early events' windows all closed before the watermark;
    // the far-future event's windows are still open and must NOT emit
    val expected = Seq(base, base + 5 * sec, base + 8 * sec)
      .flatMap(tMs => hopWindowsOf(tMs * 1000L, 30L * 1000000L, 10L * 1000000L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.toMap == expected)
    assert(out.map(_._2).sum == 9L) // 3 events x 3 windows each
  }

  test("transitionMatrix: counts adjacent pairs per key, p sums to 1") {
    import spark.implicits._
    // user 1: a->b->a->a   user 2: b->a   user 3: a (no transition)
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "a"),
      (2L, 1L, "b"), (2L, 2L, "a"),
      (3L, 1L, "a"))
      .map { case (u, i, st) => (u, i, 1000L * i, st) }
      .toDF("user_id", "event_id", "us", "state")
      .withColumn("t", timestamp_micros($"us"))
    val got = Temporal.transitionMatrix(df, "user_id", "t", "event_id",
        "state")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === Map(
      ("a", "b") -> (1L, 0.5), ("a", "a") -> (1L, 0.5),
      ("b", "a") -> (2L, 1.0)))
  }

  test("transitionMatrix: ties break on the tie column, single-row keys drop") {
    import spark.implicits._
    // same timestamp: order must follow event_id => x->y, not y->x
    val df = Seq((1L, 1L, 5L, "x"), (1L, 2L, 5L, "y"))
      .toDF("user_id", "event_id", "us", "state")
      .withColumn("t", timestamp_micros($"us"))
    val got = Temporal.transitionMatrix(df, "user_id", "t", "event_id",
        "state")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("x", "y", 1L)))
  }
}
