package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate reuses one JVM-wide
  * session; config mirrors the engine's Verify/Bench sessions).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterEach {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf: String = "/root/testdata/sf0.001"

  /** Drain a self-terminating (AvailableNow) query and GUARANTEE it is
    * no longer active when this returns. A bare
    * `awaitTermination(timeout)` returns FALSE silently on timeout; the
    * test then reads half-written output while the stream still runs,
    * and a restart on the same checkpoint force-stops the live run
    * mid-micro-batch — the source of environment-sensitive
    * planning-exception flakes on loaded hosts. Asserting the result
    * makes a slow drain fail loudly, and the finally-stop leaves no
    * background stream behind either way (stop() on an
    * already-terminated query is a no-op).
    */
  implicit class StreamDrainOps(q: StreamingQuery) {
    def drain(timeoutMs: Long = 300000L): Unit =
      try assert(q.awaitTermination(timeoutMs),
        s"stream ${q.id} did not terminate within $timeoutMs ms")
      finally q.stop()

    /** Drain variant for transformWithState queries with TTL / timers:
      * those never self-terminate under AvailableNow (the timer wheel
      * keeps the query alive and `noNewData` is never signaled, so
      * BOTH awaitTermination and processAllAvailable block until their
      * timeout). Poll the query status to idle instead — every batch
      * for the input available now has committed once lastProgress is
      * set and no data/trigger is pending — then stop cleanly.
      */
    def drainAvailable(timeoutMs: Long = 300000L): Unit =
      try {
        val deadline = System.currentTimeMillis() + timeoutMs
        // A progress event is posted only after its batch COMMITTED. The
        // zombie loop keeps running EMPTY batches, so "some batch carried
        // rows and the newest batch carried none" means every input file
        // present at the call is in the sink — all any assertion reads.
        // (Callers append input before starting the query, so the rows>0
        // batch always exists.)
        def caughtUp: Boolean = {
          val ps = q.recentProgress
          ps.exists(_.numInputRows > 0) && ps.last.numInputRows == 0
        }
        while (q.isActive && !caughtUp &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        q.exception.foreach(throw _) // surface a stream death, not a timeout
        assert(caughtUp || !q.isActive,
          s"stream ${q.id} did not drain within $timeoutMs ms " +
            s"(lastProgress=${Option(q.lastProgress).orNull})")
      } finally q.stop()
  }

  /** Leak guard: no streaming query may outlive its test — a live
    * stream's micro-batch thread races the next test's file cleanup,
    * and a restart on its checkpoint force-stops it mid-batch.
    */
  override protected def afterEach(): Unit = {
    spark.streams.active.foreach { q =>
      try q.stop() catch { case _: Throwable => () }
    }
    super.afterEach()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder().appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
