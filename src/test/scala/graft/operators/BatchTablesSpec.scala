package graft.operators

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Locking semantics of the dynamic-partition-overwrite scope — the
  * ADVICE-r12 TOCTOU regression: observing `dynamic` on a session is NOT
  * authorization for the lock-free path, because the reading may be a
  * concurrent slow-path caller's transient set whose finally-restore
  * reverts the mode mid-body (an overwrite insert then runs STATIC and
  * truncates the table). Only an explicit permanent pin
  * (`pinDynamicOverwrite`) unlocks the fast path.
  */
class BatchTablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val key = "spark.sql.sources.partitionOverwriteMode"

  test("an unpinned session serializes under the lock even when the mode " +
      "reads dynamic (transient slow-path set cannot be fast-pathed)") {
    val s = spark.newSession()
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() =>
      BatchTables.withDynamicOverwrite(s) {
        entered.countDown()
        release.await(30, TimeUnit.SECONDS)
      })
    holder.start()
    try {
      assert(entered.await(30, TimeUnit.SECONDS))
      // the racing reader of the OLD code: mode observes dynamic...
      assert(s.conf.get(key).equalsIgnoreCase("dynamic"))
      // ...but a second writer must NOT proceed lock-free on that
      // observation — it has no pin, so it blocks on the library lock
      // until the holder's window closes
      @volatile var secondRan = false
      @volatile var modeInBody: Option[String] = None
      val second = new Thread(() =>
        BatchTables.withDynamicOverwrite(s) {
          modeInBody = s.conf.getOption(key)
          secondRan = true
        })
      second.start()
      second.join(500)
      assert(!secondRan,
        "the unpinned writer fast-pathed through a transient dynamic " +
          "window — the r12 TOCTOU")
      release.countDown()
      second.join(30000)
      assert(secondRan)
      // its own window held dynamic for the whole body
      assert(modeInBody.exists(_.equalsIgnoreCase("dynamic")))
    } finally release.countDown()
    holder.join(30000)
    // both windows closed: the session is back to its pre-call state
    assert(s.conf.getOption(key).forall(!_.equalsIgnoreCase("dynamic")))
  }

  test("a pinned session keeps the lock-free fast path (concurrent " +
      "maintenance writers never serialize) and stays dynamic forever") {
    val pinned = spark.newSession()
    val other = spark.newSession()
    BatchTables.pinDynamicOverwrite(pinned)
    assert(pinned.conf.get(key).equalsIgnoreCase("dynamic"))
    // a slow-path writer on ANOTHER session holds the library lock...
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() =>
      BatchTables.withDynamicOverwrite(other) {
        entered.countDown()
        release.await(30, TimeUnit.SECONDS)
      })
    holder.start()
    try {
      assert(entered.await(30, TimeUnit.SECONDS))
      // ...and the pinned session's writer completes WITHOUT waiting on
      // it — the concurrency Pipeline's five hooks rely on
      @volatile var ran = false
      val fast = new Thread(() =>
        BatchTables.withDynamicOverwrite(pinned) { ran = true })
      fast.start()
      fast.join(5000)
      assert(ran, "the pinned fast path blocked on the library lock")
    } finally release.countDown()
    holder.join(30000)
    // a slow-path window ON the pinned session saves+restores dynamic:
    // the pin can never be reverted
    BatchTables.withDynamicOverwrite(pinned) {}
    assert(pinned.conf.get(key).equalsIgnoreCase("dynamic"))
  }
}
