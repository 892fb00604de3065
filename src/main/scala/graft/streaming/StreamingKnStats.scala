package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** CONTINUOUS Kneser-Ney stats maintenance — the t32 fold run as a
  * stream (the StreamingExactSubstr posture for the LM member): each
  * micro-batch of documents collapses to its mergeable KN stats frame
  * (`TextAnalysis.knStats` — trigram-type + unigram counts, exact
  * BIGINTs) and lands in its own `statsDir/batch=N` partition
  * directory.
  *
  * Replay-idempotence is BY CONSTRUCTION, not by marker: a batch write
  * is `mode(overwrite)` into a directory keyed by the batch id, so a
  * crash-replayed micro-batch overwrites its own partition with
  * identical content instead of double-counting — the reason the fold
  * here is per-batch parquet + merge-at-read rather than a mutated
  * running total (addition is not idempotent; directory overwrite is).
  * The merge happens at READ time ([[readStats]]): KN stats are
  * vocabulary-TYPE-bounded, so the grouped addition over all batch
  * partitions is a small aggregate however much text the stream has
  * consumed — scored history is never rescanned, and a perplexity
  * filter can score any frame from the maintained artifact via
  * `TextAnalysis.knScoreFromStats` while the stream keeps folding.
  */
object StreamingKnStats {

  /** Start the maintenance loop: docs stream in, per-batch stats land
    * in `statsDir/batch=<id>` ([[BatchStats]] carries the overwrite /
    * merge-at-read protocol and its contracts).
    */
  def start(stream: DataFrame, idCol: String, textCol: String,
            statsDir: String, checkpointDir: String): StreamingQuery =
    BatchStats.start(stream, statsDir, checkpointDir)(
      graft.llm.TextAnalysis.knStats(_, idCol, textCol))

  /** The maintained artifact, merged at read time — a
    * [[graft.llm.TextAnalysis.mergeKnStats]] of every batch in one
    * aggregate. Feed it to `knScoreFromStats`.
    */
  def readStats(spark: SparkSession, statsDir: String): DataFrame =
    BatchStats.readMerged(spark, statsDir,
      Seq("kind", "w1", "w2", "w3"), Seq("c"))
}
