package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Generic CONTINUOUS maintenance of a mergeable count-stats artifact —
  * the harness every incremental-stats member's streaming form shares
  * (KN trigram stats, tokenizer word frequencies, BM25 stats): each
  * micro-batch collapses to its stats frame and lands in its own
  * `statsDir/batch=N` partition directory with OVERWRITE semantics.
  *
  * Replay-idempotence is BY CONSTRUCTION, not by marker: addition is
  * not idempotent, directory overwrite is — a crash-replayed batch
  * rewrites its own partition with identical content instead of
  * double-counting. The merge happens at READ time ([[readMerged]]):
  * count-stats frames are type-bounded (they saturate under a bounded
  * vocabulary), so the grouped addition over all batch partitions is a
  * small aggregate however much data the stream has consumed — scored
  * history is never rescanned.
  *
  * Restarting from the same checkpoint replays cleanly; resetting the
  * checkpoint against a kept statsDir double-counts — use a fresh
  * statsDir when resetting, the StreamingExactSubstr contract.
  */
object BatchStats {

  /** Start the loop: `statsOf(batch)` must yield a frame whose
    * non-`countCols` columns are grouping keys and whose counts merge
    * by addition (the knStats / WordFreq.stats / bm25Stats contract).
    */
  def start(stream: DataFrame, statsDir: String, checkpointDir: String)
           (statsOf: DataFrame => DataFrame): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        statsOf(batch.toDF())
          .write.mode("overwrite").parquet(s"$statsDir/batch=$batchId")
        ()
      }
      .start()

  /** The maintained artifact, merged at read time: one grouped
    * addition of `countCols` over every batch partition (the `batch`
    * partition column itself is dropped by the grouping).
    */
  def readMerged(spark: SparkSession, statsDir: String,
                 keyCols: Seq[String], countCols: Seq[String])
      : DataFrame = {
    require(countCols.nonEmpty, "BatchStats.readMerged: need count cols")
    val sums = countCols.map(c => sum(col(c)).as(c))
    spark.read.parquet(statsDir)
      .groupBy(keyCols.map(col): _*)
      .agg(sums.head, sums.tail: _*)
  }
}
