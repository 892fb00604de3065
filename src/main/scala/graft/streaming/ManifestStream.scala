package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.{CorpusPipeline, ShardManifest}

/** CONTINUOUS training-shard-manifest maintenance — the [[BatchStats]]
  * harness instantiated for [[ShardManifest.binStats]], exactly the
  * shape the harness was built for: each micro-batch of document drops
  * is packed (the l06 greedy fold) and collapsed to its per-(shard,
  * bkey) bin stats, which land in an overwrite-idempotent `batch=N`
  * partition; the live manifest a training job reads is the grouped
  * fold over every partition ([[readManifest]]), so a streamed corpus
  * keeps its manifest current WITHOUT a batch rescan of packed history
  * (l24's steady state, on the stream).
  *
  * Correctness rides two already-gated facts:
  *  - bin stats are the MERGEABLE granularity — n_docs/n_tokens fold by
  *    addition and the mod-P checksum by addition-then-reduce, so the
  *    per-shard rollup of folded partials equals the whole-corpus
  *    manifest (l24's hash gate against l23);
  *  - batches must align to pack-block boundaries (block = id div
  *    blockSize is id-derived and packing is per-block), the same
  *    precondition l24 documents — a drop that splits a block would bin
  *    its fragment differently than the whole-corpus pack.
  *
  * Spec-gated (ManifestStreamSpec): streamed-fold ≡ whole-corpus
  * manifest, replay idempotence (re-drain on the same checkpoint), and
  * compaction interop ([[BatchStats.compact]] preserves the manifest).
  *
  * NOTE on the checksum column: partitions hold per-batch partials
  * already reduced mod P; [[BatchStats.readMerged]] sums them raw and
  * [[ShardManifest.manifestFromBinStats]] applies the final mod — exact
  * while a (shard, bkey) bin spans < ~9.2e9 batches, the same BIGINT
  * headroom argument the manifest itself rides.
  */
object ManifestStream {

  private val keyCols = Seq("shard", "bkey")
  private val countCols = Seq("n_docs", "n_tokens", "checksum")

  /** Start the maintenance loop over a document stream: pack each
    * micro-batch and land its bin stats (the [[BatchStats.start]]
    * contract — overwrite-idempotent per-batch partitions).
    */
  def start(stream: DataFrame, statsDir: String, checkpointDir: String,
            nShards: Int, capacity: Int, blockSize: Int = 256,
            idCol: String = "doc_id", textCol: String = "text")
      : StreamingQuery =
    BatchStats.start(stream, statsDir, checkpointDir) { batch =>
      ShardManifest.binStats(
        CorpusPipeline.packSequences(batch, capacity, blockSize,
          idCol = idCol, textCol = textCol), nShards)
    }

  /** The live manifest: merge every committed batch partition's bin
    * stats, then roll up per shard — identical to
    * [[ShardManifest.manifest]] over the whole corpus packed at once
    * (block-aligned batches; spec-gated).
    */
  def readManifest(spark: SparkSession, statsDir: String): DataFrame =
    ShardManifest.manifestFromBinStats(
      BatchStats.readMerged(spark, statsDir, keyCols, countCols))

  /** Listing-cost valve passthrough: fold committed batch partitions
    * (see [[BatchStats.compact]] for the checkpoint precondition).
    */
  def compact(spark: SparkSession, statsDir: String,
              upToBatch: Long): Seq[Long] =
    BatchStats.compact(spark, statsDir, keyCols, countCols, upToBatch)
}
