package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** One-off measurement: unsalted vs salted as-of join and sessionization on
  * the sf0.1 events table (uniform keys — the salted forms' overhead case).
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val GAP = 1800000000L
    val BUCKET = 3600000000L // 1h salt buckets
    def e = Tables(spark, sfDir, "events")
    def p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    def c = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"))
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "asof_plain" -> (() => Temporal.asofJoinBackward(p, c, "user_id", "ts", "ts", "event_id")),
      "asof_salted" -> (() => Temporal.asofJoinBackwardSalted(p, c, "user_id", "ts", "ts", "event_id", BUCKET)),
      "sess_plain" -> (() => Temporal.sessionIndex(e, "user_id", "ts", "event_id", GAP)
        .groupBy(col("user_id"), col("_session")).agg(count(lit(1)).as("n"))),
      "sess_salted" -> (() => Temporal.sessionIndexSalted(e, "user_id", "ts", "event_id", GAP, BUCKET)
        .groupBy(col("user_id"), col("_session")).agg(count(lit(1)).as("n"))))
    variants.foreach { case (name, mk) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = Seq.fill(3)(once()).sorted
      println(f"[salt] $name%12s median=${ts(1)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
