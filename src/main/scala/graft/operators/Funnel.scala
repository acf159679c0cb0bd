package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for a step sequence
  * (e.g. signup → view → click → purchase), a user completes step i+1 at
  * the FIRST event of that type strictly after their step-i completion
  * time — the standard product-analytics funnel semantics.
  *
  * Scale shape: one `groupBy(user)` aggregation per step plus one
  * equality join per transition, all keyed on the user column (uniform,
  * no hot keys beyond real user skew); the event scan is filtered to one
  * event type per stage, so predicate pushdown keeps each stage's input
  * small. No windows, no per-user sorting, no collect.
  */
object Funnel {

  /** Per-user first-completion timestamps: (user, t1 .. tk), where t(i)
    * is null if the user never reached step i. Left-joined chain, so every
    * user who completed step 1 appears.
    *
    * `materialize` (default true) checkpoints the narrow
    * (user, type, ts) projection filtered to the funnel's step types, so
    * the k chained stages share ONE source scan instead of re-reading the
    * event table once per stage.
    *
    * `maxGapUs` (None = unbounded) is the per-TRANSITION conversion
    * window: step i+1 counts only within `maxGapUs` micros of the step-i
    * completion — "converted within 48 h" product semantics. The bound
    * applies per transition, not to the whole funnel (t_k − t_1 can
    * exceed k·maxGapUs is impossible, but (k−1)·maxGapUs is the total
    * ceiling). Note the semantics are still FIRST-completion greedy: the
    * chain anchors at each step's earliest qualifying time; a later
    * step-i event that would open a window a later step-i+1 event fits
    * is NOT explored (the standard funnel contract, documented — exact
    * windowed-path search is a different, combinatorial operator).
    */
  def stepTimes(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, steps: Seq[String],
                materialize: Boolean = true,
                maxGapUs: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(maxGapUs.forall(_ > 0), s"maxGapUs must be positive, got $maxGapUs")
    val projected = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(typeCol), col(tsCol))
    val narrow = if (materialize) projected.localCheckpoint(true) else projected
    // micros gap on timestamps; integral time columns compare as-is
    val asUs: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      events.schema(tsCol).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(_)
        case _ => _.cast("long")
      }
    var acc = narrow.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t1"))
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      val prevT = s"t${i + 1}"
      val nextT = s"t${i + 2}"
      val inWindow = maxGapUs
        .map(g => asUs(col(tsCol)) - asUs(col(prevT)) <= g)
        .getOrElse(lit(true))
      val stage = narrow.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol))
        .join(acc.select(col(userCol), col(prevT)), Seq(userCol))
        .filter(col(tsCol) > col(prevT) && inWindow)
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as(nextT))
      acc = acc.join(stage, Seq(userCol), "left")
    }
    acc
  }

  /** The funnel report: (step, step_name, n_users) with steps 1-indexed
    * in sequence order. n_users is monotonically non-increasing by
    * construction.
    */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   maxGapUs: Option[Long] = None): DataFrame = {
    val times = stepTimes(events, userCol, typeCol, tsCol, steps,
      maxGapUs = maxGapUs)
    val stepHits = array(steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1).as("step"), lit(name).as("step_name"),
        col(s"t${i + 1}").isNotNull.as("hit"))
    }: _*)
    times.select(explode(stepHits).as("s"))
      .groupBy(col("s.step").as("step"), col("s.step_name").as("step_name"))
      .agg(sum(when(col("s.hit"), 1L).otherwise(0L)).as("n_users"))
      .orderBy(col("step"))
  }
}
