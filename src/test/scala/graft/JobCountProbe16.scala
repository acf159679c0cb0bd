package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Round-16 evidence probe (runMain): count the SPARK JOBS a query
  * launches end-to-end — a STEAL-IMMUNE before/after metric for the
  * job-fusion work (hypervisor weather moves wall-clock, never job
  * counts; every fused convergence action is exactly one job fewer per
  * round). Usage:
  *   Test/runMain graft.JobCountProbe16 <sfDir> <q1,q2,...>
  * Prints one line per query: JOBS <name> <count>.
  */
object JobCountProbe16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    names.foreach { name =>
      require(SparkEntry.queries.contains(name), s"no such query: $name")
      // warm the session once per query so one-time init doesn't count
      jobs.set(0)
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // listener events are async — settle before reading (job STARTS
      // are enqueued before the action returns; a short drain suffices,
      // and an undercount would only understate the win)
      Thread.sleep(300)
      println(s"JOBS $name ${jobs.get()}")
    }
    spark.stop()
  }
}
