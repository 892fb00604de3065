package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Tracked plan-lifetime caches — the explicit-release contract for
  * operators that MUST persist an intermediate whose consumers outlive
  * the call (`CombineData.combine`'s twice-joined dim, `Ids.denseIds`/
  * `runningTotal`'s pinned range partitioning, the registry gram
  * fixtures). Those blocks cannot unpersist inside the operator — the
  * returned plan still reads them lazily — so each persist registers
  * here instead, and the OWNER of the scope releases exactly the caches
  * its work created:
  *
  *   - registry queries track into [[CacheScope.harness]], which Verify/
  *     Bench/AnsiSweep release after every query;
  *   - `Pipeline.run` owns a private scope per run, so a full pipeline
  *     releases its own blocks and NOTHING else — caches created
  *     concurrently by other jobs sharing the SparkSession are untouched
  *     (a blunt `clearCache()`, or diffing `getPersistentRDDs`, would
  *     drop those too);
  *   - an embedding consumer passes its own scope (or releases
  *     [[CacheScope.harness]]) and inherits no silent cache growth.
  */
final class CacheScope {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` at `level` and register it for [[release]]. */
  def track[T](ds: Dataset[T],
               level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
    synchronized {
      ds.persist(level)
      tracked += ds
      ds
    }

  /** Unpersist every tracked dataset (non-blocking) and forget it. Only
    * blocks THIS scope registered are touched.
    */
  def release(): Unit = synchronized {
    tracked.foreach { ds =>
      try ds.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    tracked.clear()
  }

  /** Number of currently-tracked datasets (spec observability). */
  def trackedCount: Int = synchronized(tracked.size)
}

object CacheScope {
  /** Default scope for registry queries. The harness mains release it
    * between queries; long-lived embedders release it (or pass a scope
    * of their own) once each result is consumed.
    *
    * CONTRACT (correctness, not just memory): this is a process-global
    * mutable scope. For operators whose persist pins a partitioning the
    * RESULT depends on (`Ids.denseIds`/`runningTotal` pin a range
    * exchange; recomputing it after release could reorder offsets), a
    * harness-default result must be FULLY CONSUMED before any
    * `harness.release()` — a release while a returned-but-unconsumed
    * plan is alive silently recomputes the exchange. Concurrent suites
    * or sessions sharing one JVM must NOT interleave harness releases
    * with each other's live plans; they should pass an explicitly owned
    * scope instead (as `Pipeline.run` does). The single-threaded
    * Verify/Bench/AnsiSweep mains satisfy this by construction: each
    * query is materialized to completion before the next release.
    */
  val harness = new CacheScope
}
