package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line for the driver's BENCH_r{N}.json.
  *
  * Methodology: per query, one warmup execution (absorbs codegen, parquet
  * footer reads and JIT), then 3 timed executions writing every output
  * column to the `noop` sink (so column pruning cannot skip real expression
  * work the way `.count()` does); the reported number is the median.
  */
object Bench {

  /** 1-minute load average, or -1 where /proc is unavailable. */
  def load1(): Double = scala.util.Try {
    val src = scala.io.Source.fromFile("/proc/loadavg")
    try src.mkString.trim.split("\\s+")(0).toDouble finally src.close()
  }.getOrElse(-1.0)

  /** Cumulative hypervisor steal time in seconds (/proc/stat cpu col 8),
    * or -1 where unavailable. Loadavg only sees GUEST-runnable tasks — on
    * a VM a noisy host neighbor slows every task while load reads 0; the
    * start/end DELTA of this counter is the signal that catches it
    * (round-7 lesson: 4x wall-clock swings on identical code at load<1).
    */
  def stealSec(): Double = scala.util.Try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val cols = src.getLines().next().trim.split("\\s+")
      cols(8).toDouble / 100.0 // USER_HZ ticks
    } finally src.close()
  }.getOrElse(-1.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    // Contamination guard (round-6 lesson: a bench recorded on a contended
    // box showed phantom 5-15x regressions in unchanged code). Wait for the
    // box to go quiet rather than refusing outright — refusing would zero
    // the round's artifact when the driver's own prior step is still
    // decaying out of the 1-minute average. If it never goes quiet, run
    // anyway but stamp the JSON so a hot measurement can't be mistaken for
    // a clean one.
    val maxLoad = sys.env.get("SPARK_GRAFT_BENCH_MAX_LOAD")
      .map(_.toDouble).getOrElse(1.5)
    val waitSec = sys.env.get("SPARK_GRAFT_BENCH_WAIT")
      .map(_.toInt).getOrElse(180)
    val deadline = System.nanoTime() + waitSec * 1000000000L
    var loadStart = load1()
    while (loadStart > maxLoad && System.nanoTime() < deadline) {
      System.err.println(f"[bench] load1=$loadStart%.2f > $maxLoad%.2f — waiting for quiet box")
      Thread.sleep(5000)
      loadStart = load1()
    }
    val contaminated = loadStart > maxLoad
    val stealStart = stealSec()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // optional comma-separated subset (re-measurement / scale sweeps);
    // unset = the driver's full run
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names no such query: ${unknown.mkString(", ")}")
    }
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)

    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = try {
        runOnce(fn) // warmup
        val times = Seq.fill(3)(runOnce(fn)).sorted
        times(1) // median
      } catch { case _: Throwable => -1.0 }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val loadEnd = load1() // includes our own run's decay; load_start is the clean-box signal
    // steal is reported as the delta over the run: CPU seconds the host
    // gave to a neighbor VM while this bench wanted to run. A nonzero-ish
    // value (more than a few seconds) marks the run contended even when
    // loadavg was clean.
    val stealRun = { val s = stealSec()
      if (s < 0 || stealStart < 0) -1.0 else s - stealStart }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","load_start":$loadStart,"load_end":$loadEnd,"steal_sec":$stealRun,"contaminated":$contaminated}""")
    spark.stop()
  }
}
