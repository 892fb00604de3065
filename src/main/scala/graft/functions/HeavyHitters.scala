package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters via two passes — the scale-correct
  * form of "top tokens" when the domain is too large to groupBy whole:
  *
  *  1. NOMINATE: every partition runs a Space-Saving sketch (Metwally et
  *     al. 2005) over its rows and emits its ≤ `cap` candidate items —
  *     O(cap) memory per task regardless of domain size.
  *  2. COUNT: the (tiny, ≤ cap × partitions) candidate set broadcasts
  *     back; only candidate rows are counted exactly, and the top `k`
  *     by (count desc, item asc) are returned.
  *
  * Correctness: an item with global frequency > N/cap exceeds n_p/cap in
  * at least one partition (averaging), and Space-Saving guarantees every
  * such item owns a counter at partition end — so any global heavy
  * hitter is nominated and pass 2 makes its count EXACT. Items below
  * that bar may or may not appear; choose `cap` ≫ k (default 16×) so
  * the k-th true hitter is far above the nomination bar. The result is
  * deterministic (no sketch counts survive into the output), which is
  * what lets the registry hash-check it against a plain GROUP BY oracle.
  */
object HeavyHitters {

  /** Space-Saving pass over one iterator: maintain `cap` counters; a new
    * item evicts the minimum counter and inherits its count (+1). Emits
    * the surviving items.
    */
  def spaceSavingCandidates(items: Iterator[String],
                            cap: Int): Iterator[String] = {
    require(cap > 0, s"cap must be positive, got $cap")
    val counts = scala.collection.mutable.HashMap[String, Long]()
    items.foreach { item =>
      counts.get(item) match {
        case Some(c) => counts(item) = c + 1
        case None if counts.size < cap => counts(item) = 1L
        case None =>
          // evict the min counter (ties by item for determinism)
          val (minItem, minCount) = counts.minBy { case (i, c) => (c, i) }
          counts.remove(minItem)
          counts(item) = minCount + 1
      }
    }
    counts.keysIterator
  }

  /** Exact top-`k` items of `itemCol` by count. `cap` is the per-task
    * sketch width (memory bound and nomination bar).
    *
    * The nomination guarantee only covers items with global count >
    * N/cap, so exactness is VERIFIED after pass 2, not assumed: the run
    * is accepted iff the k-th returned count clears the N/width bar (or
    * the sketch provably kept every distinct item). Otherwise the cap
    * quadruples and both passes re-run — the loop terminates because
    * width eventually reaches the distinct-item count, where
    * Space-Saving degenerates to an exact hash aggregate. The cast input
    * is persisted for the loop's lifetime so each attempt re-reads the
    * cache, not the source; per attempt the check itself costs one
    * bounded `.collect()` of ≤ k rows, plus — only the first time a bar
    * check fails — a one-time distinct count of the cached input.
    */
  def topK(df: DataFrame, itemCol: String, k: Int,
           cap: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val items: Dataset[String] =
      df.select(col(itemCol).cast("string")).as[String]
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = items.count()
      var distinctN = -1L // computed lazily, once, on first bar-check miss
      var width = if (cap > 0) cap else math.max(k * 16, 64)
      var result: Array[(String, Long)] = null
      var exact = false
      while (!exact) {
        val candidates = items
          .mapPartitions(it => spaceSavingCandidates(it, width))
          .distinct()
          .toDF("item")
        val nCandidates = candidates.count()
        result = items.toDF("item")
          .join(broadcast(candidates), Seq("item"))
          .groupBy("item").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("item"))
          .limit(k)
          .as[(String, Long)].collect()
        val bar = n / width // items strictly above this are always nominated
        exact =
          if (result.isEmpty) true // no rows at all
          else if (result.length == k && result.last._2 > bar) true
          else {
            if (distinctN < 0) distinctN = items.distinct().count()
            if (nCandidates == distinctN) true // kept all distinct items
            else { width = width * 4; false }
          }
      }
      spark.createDataset(result.toSeq).toDF("item", "cnt")
        .orderBy(col("cnt").desc, col("item"))
    } finally items.unpersist()
  }
}
