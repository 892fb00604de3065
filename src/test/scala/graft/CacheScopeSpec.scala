package graft

import org.apache.spark.sql.functions._

/** The tracked plan-lifetime cache contract (CacheScope): operators that
  * must persist blocks their returned plan still reads register them in a
  * scope, and releasing the scope unpersists EXACTLY those blocks — no
  * silent cache accumulation for embedding consumers, no collateral
  * release of caches other work created on the shared session.
  */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def cachedRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("denseIds build-and-release leaves no cached RDDs behind") {
    val before = cachedRddIds
    val scope = new CacheScope
    val df = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val ids = graft.etl.Ids.denseIds(df, Seq(col("k")), scope = scope)
    assert(ids.count() == 500)
    assert(scope.trackedCount == 1)
    assert((cachedRddIds -- before).nonEmpty) // the pinned range shuffle
    scope.release()
    assert(scope.trackedCount == 0)
    assert(cachedRddIds.subsetOf(before))     // nothing of ours remains
  }

  test("runningTotal tracks into the harness scope by default") {
    CacheScope.harness.release() // clean slate
    val before = cachedRddIds
    val df = (1 to 200).map(i => (i.toLong, 2L)).toDF("k", "amt")
    val rt = graft.etl.Ids.runningTotal(df, Seq(col("k")), col("amt"))
    assert(rt.agg(max("running_total")).first().getLong(0) == 400L)
    assert(CacheScope.harness.trackedCount == 1)
    CacheScope.harness.release()
    assert(cachedRddIds.subsetOf(before))
  }

  test("releasing one scope never drops another scope's caches") {
    val mine = new CacheScope
    val other = new CacheScope
    val kept = other.track(Seq((1L, "keep")).toDF("k", "v"))
    assert(kept.count() == 1)
    val tracked = mine.track(Seq((2L, "drop")).toDF("k", "v"))
    assert(tracked.count() == 1)
    mine.release()
    // the other scope's block is still cached (storage level retained)
    assert(kept.storageLevel.useMemory || kept.storageLevel.useDisk)
    assert(!(tracked.storageLevel.useMemory || tracked.storageLevel.useDisk))
    other.release()
  }
  // Pipeline.run's scope ownership (its own caches released, a
  // pre-existing user cache untouched) is pinned end-to-end in SinksSpec.
}
