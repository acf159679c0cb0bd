package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-11 second-wave operators (retractable MV,
  * CMS join-size estimate, DQ constraint suite, transition matrix,
  * sequence-gap audit): disjoint shifted-id copies of the sf tables
  * (the ScaleDataGen discipline — group/key cardinalities scale with the
  * data). Claimed shapes under test:
  *
  *  - Retract.mvDeltas: one explode + one map-side-combined hash agg —
  *    scan-bound, delta output O(groups);
  *  - CountMin.joinSizeEstimate: two sketch builds (scan-bound) + a
  *    sketch-sized broadcast join — the estimate step itself is flat;
  *  - Checks.scalarReport: ONE scan however many constraints;
  *  - Temporal.transitionMatrix: one key shuffle + |states|² agg;
  *  - Validate.sequenceGaps: one partition-key shuffle, output = holes.
  *
  * Usage: Round11WaveBProbe <sfDir> [mult]   (default mult = 10)
  */
object Round11WaveBProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val ev0 = Tables(spark, dir, "events")
    val ev = (0 until mult).map { i =>
      ev0.select(($"event_id" + lit(i.toLong * 1000000000L)).as("event_id"),
        ($"user_id" + lit(i.toLong * 10000000L)).as("user_id"),
        $"ts", $"event_type", $"value", $"props")
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[probe] events x$mult: ${ev.count()} rows, " +
      s"${mult * 150} users")

    val groupOf = (img: org.apache.spark.sql.Column) =>
      struct(img.getField("event_type").as("event_type"),
        floor(img.getField("value") / 50).cast("long").as("band"))
    val measureOf = (img: org.apache.spark.sql.Column) =>
      floor(img.getField("value") * 100)
    timed(s"Retract changelog+mvDeltas x$mult") {
      val d = graft.cdc.Retract.mvDeltas(
        graft.cdc.EventsAsChangeLog.retractable(ev), groupOf, measureOf)
      println(s"[probe]   delta groups=${d.count()}")
    }

    timed(s"CMS joinSizeEstimate (2 sketches + inner product) x$mult") {
      val est = graft.operators.CountMin.joinSizeEstimate(
        graft.operators.CountMin.sketch(
          ev.filter($"event_type" === "click"), "user_id"),
        graft.operators.CountMin.sketch(
          ev.filter($"event_type" === "purchase"), "user_id"))
      println(s"[probe]   est=${est.collect().head.getLong(0)}")
    }

    timed(s"Checks.scalarReport (5 constraints, one scan) x$mult") {
      val rep = graft.operators.Checks.scalarReport(ev, Seq(
        graft.operators.Checks.notNull("value"),
        graft.operators.Checks.notNull("props"),
        graft.operators.Checks.inRange("value", lit(0.0), lit(500.0)),
        graft.operators.Checks.matches("event_type", "^[a-z]+$"),
        graft.operators.Checks.inRange("event_id", lit(0L),
          lit(Long.MaxValue))))
      println(s"[probe]   rows=${rep.count()}")
    }

    timed(s"transitionMatrix x$mult") {
      val t = graft.operators.Temporal.transitionMatrix(ev, "user_id",
        "ts", "event_id", "event_type")
      println(s"[probe]   cells=${t.count()}")
    }

    timed(s"sequenceGaps (mod-97 holes) x$mult") {
      val damaged = ev.filter(pmod($"event_id", lit(97L)) =!= 5L)
        .withColumn("block", floor($"event_id" / 1000L).cast("long"))
      println(s"[probe]   holes=${graft.cdc.Validate
        .sequenceGaps(damaged, Seq("block"), "event_id").count()}")
    }

    spark.stop()
  }
}
