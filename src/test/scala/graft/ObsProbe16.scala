package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 probe (runMain, not a suite): does an `observe()` metric fire
  * when the observed Dataset is materialized by `localCheckpoint(true)`?
  * If yes, every iterative loop can read its convergence count from the
  * SAME job that materializes the round — halving per-round job count.
  * Also times N checkpoint+count rounds vs N observed-checkpoint rounds
  * to size the win.
  */
object ObsProbe16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // correctness: observation value vs count, with a timeout guard
    val obs = Observation("probe1")
    val df = spark.range(100000L).filter(col("id") % 7 === 0)
      .observe(obs, count(lit(1)).as("n"))
      .localCheckpoint(true)
    val got = scala.concurrent.Await.result(
      scala.concurrent.Future(obs.get("n").asInstanceOf[Long])(
        scala.concurrent.ExecutionContext.global),
      scala.concurrent.duration.Duration(20, "s"))
    val want = df.count()
    println(s"OBS_ON_LOCALCHECKPOINT got=$got want=$want " +
      s"match=${got == want}")

    // timing: 20 rounds of (checkpoint + count) vs (observed checkpoint)
    def roundsPlain(n: Int): Double = {
      val t0 = System.nanoTime()
      var f = spark.range(200000L).select(col("id"), (col("id") % 97).as("k"))
        .localCheckpoint(true)
      var i = 0
      while (i < n) {
        val nx = f.groupBy(col("k")).agg(count(lit(1)).as("c"))
          .select(col("k").as("id"), (col("k") + col("c")).as("k"))
          .localCheckpoint(true)
        val c = nx.count()
        f = if (c > 0) nx else f
        i += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    def roundsObs(n: Int): Double = {
      val t0 = System.nanoTime()
      var f = spark.range(200000L).select(col("id"), (col("id") % 97).as("k"))
        .localCheckpoint(true)
      var i = 0
      while (i < n) {
        val ob = Observation()
        val nx = f.groupBy(col("k")).agg(count(lit(1)).as("c"))
          .select(col("k").as("id"), (col("k") + col("c")).as("k"))
          .observe(ob, count(lit(1)).as("n"))
          .localCheckpoint(true)
        val c = ob.get("n").asInstanceOf[Long]
        f = if (c > 0) nx else f
        i += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    roundsPlain(3); roundsObs(3) // warm
    println(f"PLAIN_20_ROUNDS ${roundsPlain(20)}%.2f s")
    println(f"OBS_20_ROUNDS   ${roundsObs(20)}%.2f s")
    spark.stop()
  }
}
