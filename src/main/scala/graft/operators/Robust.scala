package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) outlier scoring — the monitor that survives
  * the anomaly it is looking for. The z-score monitor (`evt_anomaly_daily`)
  * scores against the MEAN and the STANDARD DEVIATION, and a single
  * extreme day inflates both: a 100× traffic spike drags the mean up and
  * the σ out until the spike itself scores modest — masking (the
  * textbook breakdown of moment statistics, 0% breakdown point). The
  * median and the median-absolute-deviation both have the 50% breakdown
  * point: up to half the observations can be arbitrarily corrupted
  * before the score moves, so bursts and outages stay visible no matter
  * how extreme.
  *
  * Exactness discipline (the repo's integer-numerator rule): medians of
  * BIGINT observations interpolate to halves at worst, so everything is
  * carried in DOUBLED units where it is integral again —
  *
  *   - `med2 = percentile(2x, 0.5)` — 2·median, an exact BIGINT (the
  *     midpoint of two even integers is an integer; exact below 2^52);
  *   - `d2 = |2x − med2|` — 2·|x − med|, BIGINT per row;
  *   - `mad4 = percentile(2·d2, 0.5)` — 4·MAD, again an exact BIGINT.
  *
  * The outlier test |x − med| > (k/2)·MAD (the conventional cutoff 3.5
  * is k=7) becomes the ALL-INTEGER comparison `4·d2 > k·mad4` — no
  * float ever decides a flag. The reported score is the robust z
  * `(x − med)/MAD = sign · 2·d2/mad4`: ONE correctly-rounded IEEE
  * division of two BIGINTs, gated raw (the Drift KS/TV discipline).
  *
  * 100 TB shape: the input here is already an aggregate (daily counts —
  * one (key, day) row per group per day), so both percentile passes run
  * over sketch-sized frames, grouped by key across a data-independent
  * number of rows/group (the day count). Spark's `percentile` is the
  * exact sort-based aggregate; at this row count that is the right tool
  * (the approximate-quantile path is [[Quantiles]], for when the frame
  * IS data-sized).
  *
  * MAD = 0 (more than half the days identical to the median) is the
  * documented degenerate regime: the score is NULL — division by zero
  * has no robust meaning — and the flag degrades to `d2 > 0` (any
  * deviation from the median at all), which is the k·mad4 comparison
  * itself at mad4 = 0. Groups with a single observation flag nothing.
  */
object Robust {

  /** Per-row MAD outlier scores over `df`, grouped by `keys`: emits every
    * input row plus `med2` (2·median), `mad4` (4·MAD), `mad_z` (signed
    * robust z, NULL when MAD = 0) and `is_outlier`
    * (|x − med| > (k/2)·MAD, all-integer). `valueCol` must be integral.
    *
    * `k` is in HALF-MAD units: the conventional 3.5·MAD cutoff is k = 7.
    */
  def madOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
                  k: Int = 7): DataFrame = {
    import org.apache.spark.sql.types._
    val dt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"madOutliers scores integral observations; `$valueCol` is " +
        s"${dt.simpleString} — pre-aggregate to counts/integer units first")
    val x = col(valueCol).cast("long")
    val med = df.groupBy(keys.map(col): _*)
      .agg(percentile(x * 2, lit(0.5)).cast("long").as("med2"))
    val d2 = df.join(med, keys)
      .withColumn("_d2", abs(x * 2 - col("med2")))
    val mad = d2.groupBy(keys.map(col): _*)
      .agg(percentile(col("_d2") * 2, lit(0.5)).cast("long").as("mad4"))
    d2.join(mad, keys)
      .withColumn("mad_z",
        when(col("mad4") > 0,
          signum(x * 2 - col("med2")) * (col("_d2") * 2) / col("mad4")))
      .withColumn("is_outlier", col("_d2") * 4 > col("mad4") * k)
      .drop("_d2")
  }

  /** Group-wise winsorization — clamp `valueCol` into its own group's
    * [lo, hi] quantile band (the standard numeric cleaner before
    * training: tail values are CAPPED, not dropped, so row counts and
    * joins stay intact while a fat-fingered 1e12 no longer owns the
    * scale of every downstream normalization).
    *
    * Exactness: the bounds come from Spark's exact sort-based
    * `percentile`, which is bit-identical to DuckDB's `quantile_cont`
    * (both interpolate lower + (upper−lower)·frac at index p·(n−1); the
    * repo revalidated this bit-for-bit at sf0.1 on doc_quality_bins),
    * and the clamp is min/max on raw doubles — no arithmetic, so the
    * gate compares raw, no rounding anywhere.
    *
    * 100 TB shape: one exact-percentile aggregate per group (groups ≪
    * rows), broadcast back onto the scan — the clamp itself never
    * shuffles. NULL values stay NULL under an EXPLICIT guard — both
    * engines' greatest/least SKIP nulls, so the unguarded clamp would
    * silently turn a missing measurement into p_hi (caught by
    * RobustSpec); percentiles ignore NULLs on both engines, so a
    * group's bounds come from its non-null values only.
    *
    * Output: the input plus `p_lo`, `p_hi`, and `value_w` (the clamped
    * value).
    */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
                lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi,
      s"need 0 <= lo < hi <= 1, got lo=$lo hi=$hi")
    val v = col(valueCol).cast("double")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(percentile(v, lit(lo)).as("p_lo"),
        percentile(v, lit(hi)).as("p_hi"))
    df.join(broadcast(bounds), keys)
      .withColumn("value_w",
        when(v.isNotNull, greatest(col("p_lo"), least(col("p_hi"), v))))
  }

  /** CUSUM against an EXPLICIT target — the production-monitor form
    * (the baseline comes from history/SLO, not from the series under
    * test, so deviations are plain `x − target − slack` longs; no ×n
    * lift needed). Same closed-form two-window plan as [[cusumShift]];
    * [[cusumShiftStream]] is the streaming twin, spec-pinned equal.
    */
  def cusumAgainst(df: DataFrame, keys: Seq[String], orderCol: String,
                   valueCol: String, target: Long, slack: Long,
                   threshold: Long): DataFrame = {
    require(slack >= 0 && threshold > 0,
      s"need slack >= 0 and threshold > 0, got slack=$slack threshold=$threshold")
    val run = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = col(valueCol).cast("long") - lit(target) - lit(slack)
    df.withColumn("_p", sum(dev).over(run))
      .withColumn("_m", least(lit(0L), min(col("_p")).over(run)))
      .withColumn("cusum", col("_p") - col("_m"))
      .withColumn("alarm", col("cusum") > lit(threshold))
      .drop("_p", "_m")
  }

  /** STREAMING CUSUM — `cusumAgainst` as the continuous monitor: per-key
    * state is ONE long (the running S), updated in event-time order
    * within each micro-batch ((ts, tie) — the Suppress in-batch
    * discipline) and carried across batches, so a sustained shift that
    * builds over many micro-batches alarms exactly like the batch run
    * (CusumStreamSpec pins streaming ≡ batch with the shift straddling
    * the boundary). Append mode: every observation emits with its
    * statistic — the monitor is a scorer, not a filter.
    *
    * Late/out-of-order data across batches moves the answer exactly as
    * it would any running-state monitor — rows are scored in ARRIVAL
    * batch order (in-batch event-time sorted); callers needing total
    * event-time order under lateness should run the batch closed form
    * over a watermarked window instead. 8 bytes of state per key,
    * no TTL needed.
    */
  def cusumShiftStream(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valueCol: String, target: Long,
                       slack: Long, threshold: Long): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(slack >= 0 && threshold > 0,
      s"need slack >= 0 and threshold > 0, got slack=$slack threshold=$threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val withT = df.withColumn("_us", unix_micros(col(tsCol)))
    val outSchema = withT.schema
      .add("cusum", org.apache.spark.sql.types.LongType)
      .add("alarm", org.apache.spark.sql.types.BooleanType)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    withT
      .groupByKey(r => String.valueOf(r.getAs[Any](keyCol)))
      .flatMapGroupsWithState[Long, Row](OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Long]) =>
          val sorted = rows.toArray.sortBy(r =>
            (r.getAs[Long]("_us"), r.getAs[Long](tieCol)))
          var s = state.getOption.getOrElse(0L)
          val out = sorted.map { r =>
            s = math.max(0L,
              s + r.getAs[Number](valueCol).longValue() - target - slack)
            Row.fromSeq(r.toSeq :+ s :+ (s > threshold))
          }
          state.update(s)
          out.iterator
      }
      .toDF().drop("_us")
  }

  /** One-sided CUSUM change-point detection (Page 1954) over each key's
    * ordered series — the SUSTAINED-shift monitor beside `madOutliers`'
    * single-point flags and `evt_anomaly_daily`'s z-scores: a level
    * shift of twice the slack triggers after a few points even when no
    * single point is extreme, which is exactly the regime both
    * point-wise monitors are blind to (RobustSpec pins it).
    *
    * The recursion `S_t = max(0, S_{t−1} + (x_t − target − slack))`
    * looks inherently sequential, but expands to the closed form
    * `S_t = P_t − min(0, min_{i≤t} P_i)` with `P` the running sum of
    * deviations — TWO O(1)-state running windows over one key shuffle,
    * no recursion, no mapGroups, layout-invariant.
    *
    * Exactness: `valueCol` must be integral (counts); `target` defaults
    * to the key's own mean lifted to numerators — every quantity is
    * carried ×n (n = points in the key): dev_t = n·x_t − Σx − n·slack,
    * so S stays an exact BIGINT and the alarm `S > n·threshold` is an
    * integer comparison. Output: the input row plus `cusum` (the ×n
    * statistic), `n`, and `alarm`.
    *
    * 2^63 audit — CHECKED, not assumed (the histogramDrift discipline):
    * every prefix sum P_t = n·Σ_{i≤t}x − t·Σx − t·n·slack is bounded by
    * n·(2·Σ|x| + n·slack), so the group errors when that bound reaches
    * 2^61 (a 2-bit margin absorbs the double-arithmetic rounding of the
    * check itself) instead of silently wrapping under non-ANSI long
    * arithmetic. At 10⁶ daily points of count ~10⁹ the numerators sit at
    * ~10¹⁵, five orders under the bound; series long enough to trip it
    * should window the monitor (or use `cusumAgainst`, whose deviations
    * are un-lifted).
    */
  def cusumShift(df: DataFrame, keys: Seq[String], orderCol: String,
                 valueCol: String, slack: Long,
                 threshold: Long): DataFrame = {
    require(slack >= 0 && threshold > 0,
      s"need slack >= 0 and threshold > 0, got slack=$slack threshold=$threshold")
    val x = col(valueCol).cast("long")
    val stats = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(abs(x)).as("sax"))
    val run = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBound = col("n").cast("double") *
      (lit(2d) * col("sax").cast("double") +
        col("n").cast("double") * lit(slack.toDouble)) <
      lit(2.305843009213694e18) // 2^61
    val dev = when(inBound, col("n") * x - col("sx") - col("n") * lit(slack))
      .otherwise(raise_error(concat(
        lit("cusumShift numerator overflow: n*(2*sum|x| + n*slack) >= 2^61 " +
          "for group ("),
        concat_ws(",", keys.map(c => col(c).cast("string")): _*),
        lit(") — window the series or use cusumAgainst with an explicit " +
          "target"))))
    df.join(broadcast(stats), keys)
      .withColumn("_p", sum(dev).over(run))
      .withColumn("_m", least(lit(0L), min(col("_p")).over(run)))
      .withColumn("cusum", col("_p") - col("_m"))
      .withColumn("alarm", col("cusum") > col("n") * lit(threshold))
      .drop("_p", "_m", "sx", "sax")
  }

  /** TRUNCATED-EWMA smoothing + relative control band — the third member
    * of the robust-monitoring trio beside [[madOutliers]] (level
    * outliers) and [[cusumShift]] (sustained shifts): EWMA is the classic
    * control chart for gradual drift in a per-key series. The smooth at
    * row t is the (1−α)-geometric weighted mean of the last `lookback`
    * observations:
    *
    *   ewma_t = Σ_{i<L} (1−α)^i·x_{t−i} / Σ_{i<L} (1−α)^i   (existing lags)
    *
    * Why TRUNCATED rather than the textbook infinite recurrence: the
    * recurrence is order-sequential (a per-partition scan at 100 TB
    * needs a two-phase affine carry whose float rounding depends on the
    * block split — irreproducible across layouts), and the closed form
    * Σ x_i·(1−α)^{−i} overflows double past a few thousand rows. The
    * truncated window is L lag() columns inside ONE window pass — one
    * key-shuffle, codegen arithmetic, and the weight beyond L=8 at
    * α=0.3 is 0.7⁸ ≈ 0.06 of the untruncated tail, inside the chart's
    * own modelling slack.
    *
    * Exactness: each term is one fixed IEEE expression (the weight is a
    * left-associated 0.7·0.7·… chain, the term sum a left-associated +
    * chain — an SQL oracle writes the identical parenthesization and
    * replays bit-for-bit before the round-6 release). `prior_ewma`
    * excludes the current row (lags 1..L) — the value the current
    * observation is judged against; `dev` = x − prior; `alarm` compares
    * ROUNDED signals (|dev₆| > band·|prior₆|, the composed-verdict rule)
    * so rule boundaries cannot flip on cross-engine ulp noise. Rows
    * before any history (prior undefined) alarm false, explicitly.
    */
  def ewmaSmoothed(df: DataFrame, keys: Seq[String], orderCol: String,
                   valueCol: String, alpha: Double = 0.3,
                   lookback: Int = 8, relBand: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    require(relBand > 0, s"relBand must be positive, got $relBand")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val decay = 1.0 - alpha
    // (1-α)^i as the left-associated product chain — the oracle writes
    // the same chain, so the double is identical by construction
    def pw(i: Int): Double = Seq.fill(i)(decay).foldLeft(1.0)(_ * _)
    val x = col(valueCol).cast("double")
    def term(i: Int): Column =
      when(lag(x, i).over(w).isNotNull, lit(pw(i)) * lag(x, i).over(w))
        .otherwise(lit(0.0))
    def mass(i: Int): Column =
      when(lag(x, i).over(w).isNotNull, lit(pw(i))).otherwise(lit(0.0))
    def smooth(from: Int, until: Int): Column = {
      val num = (from until until).map(term).reduce(_ + _)
      val den = (from until until).map(mass).reduce(_ + _)
      when(den > 0.0, num / den)
    }
    val cur = smooth(0, lookback)
    val prior = smooth(1, lookback + 1)
    df.withColumn("ewma", round(cur, 6))
      .withColumn("prior_ewma", round(prior, 6))
      .withColumn("dev", round(x - prior, 6))
      .withColumn("alarm",
        coalesce(abs(col("dev")) > lit(relBand) * abs(col("prior_ewma")),
          lit(false)))
  }

  /** STREAMING truncated EWMA — [[ewmaSmoothed]] as the continuous
    * monitor (the [[cusumShiftStream]] discipline): per-key state is the
    * last `lookback` observations (value + a presence bit, so a NULL
    * observation occupies its lag position exactly as the batch window
    * sees it), rows scored in event-time order within each micro-batch
    * and the history carried across batches. Every arithmetic step —
    * ascending-lag left-folded term and mass sums, the quantized weight
    * chain, round-6, the rounded-signal alarm — reproduces the batch
    * expression operation for operation, so streaming ≡ batch is
    * bit-exact BY CONSTRUCTION with the drift straddling micro-batches
    * (RobustSpec pins it). Append mode: a scorer, not a filter. State is
    * ≤ lookback (bool, double) pairs per key — bounded, no TTL needed;
    * the same arrival-order caveat as the CUSUM stream applies to late
    * data.
    */
  def ewmaSmoothedStream(df: DataFrame, keyCol: String, tsCol: String,
                         tieCol: String, valueCol: String,
                         alpha: Double = 0.3, lookback: Int = 8,
                         relBand: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    require(relBand > 0, s"relBand must be positive, got $relBand")
    val spark = df.sparkSession
    import spark.implicits._
    val decay = 1.0 - alpha
    val pw = (0 to lookback).map(i =>
      Seq.fill(i)(decay).foldLeft(1.0)(_ * _)).toArray
    // the exact Round expression semantics (HALF_UP on the BigDecimal)
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val withT = df.withColumn("_us", unix_micros(col(tsCol)))
    val outSchema = withT.schema
      .add("ewma", org.apache.spark.sql.types.DoubleType)
      .add("prior_ewma", org.apache.spark.sql.types.DoubleType)
      .add("dev", org.apache.spark.sql.types.DoubleType)
      .add("alarm", org.apache.spark.sql.types.BooleanType)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    withT
      .groupByKey(r => String.valueOf(r.getAs[Any](keyCol)))
      .flatMapGroupsWithState[Seq[(Boolean, Double)], Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row],
         state: GroupState[Seq[(Boolean, Double)]]) =>
          val sorted = rows.toArray.sortBy(r =>
            (r.getAs[Long]("_us"), r.getAs[Long](tieCol)))
          // most-recent-first history of (present, value)
          var hist: List[(Boolean, Double)] =
            state.getOption.map(_.toList).getOrElse(Nil)
          val out = sorted.map { r =>
            val cur: Option[Double] = Option(r.getAs[Any](valueCol))
              .map(_.asInstanceOf[Number].doubleValue())
            def lagAt(i: Int): Option[Double] =
              if (i == 0) cur
              else if (i - 1 < hist.length) {
                val (present, x) = hist(i - 1)
                if (present) Some(x) else None
              } else None
            // the batch fold verbatim: ascending lags, missing terms
            // still ADD 0.0 so the float op sequence is identical
            def smooth(from: Int, until: Int): Option[Double] = {
              var num = 0.0; var den = 0.0
              (from until until).foreach { i =>
                lagAt(i) match {
                  case Some(x) => num = num + pw(i) * x; den = den + pw(i)
                  case None => num = num + 0.0; den = den + 0.0
                }
              }
              if (den > 0.0) Some(num / den) else None
            }
            val ewma6 = smooth(0, lookback).map(r6)
            val priorRaw = smooth(1, lookback + 1)
            val prior6 = priorRaw.map(r6)
            val dev6 = for (x <- cur; p <- priorRaw) yield r6(x - p)
            val alarm = (for (d <- dev6; p <- prior6)
              yield math.abs(d) > relBand * math.abs(p)).getOrElse(false)
            hist = ((cur.isDefined, cur.getOrElse(0.0)) :: hist)
              .take(lookback)
            Row.fromSeq(r.toSeq :+ ewma6.map(Double.box).orNull :+
              prior6.map(Double.box).orNull :+
              dev6.map(Double.box).orNull :+ alarm)
          }
          state.update(hist)
          out.iterator
      }
      .toDF().drop("_us")
  }
}
