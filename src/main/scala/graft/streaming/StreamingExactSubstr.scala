package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.llm.Dedup

/** STREAMING ExactSubstr dedup — the d33 maintenance loop run
  * continuously over document drops: each micro-batch rewrites against
  * the persisted window-digest index (prior corpus text never scanned),
  * commits its rewrite to the lake, and only then folds its own
  * digests into the index (append-only new-distinct).
  *
  * Ordering is CORRECTNESS, not style (the d33 lesson): the fold
  * appends to the index path, which invalidates any uncommitted plan
  * reading it — a batch whose rewrite is still lazy at fold time would
  * silently re-evaluate against the post-fold index and dedup against
  * its own digests, emptying every document. Rewrite → commit → fold.
  *
  * Crash-safety / exactly-once (the [[CorpusStream]] idempotent-sink
  * recipe, hardened for the index side effect):
  *  - each batch writes its own `batch=<id>` directory; a batch whose
  *    `_SUCCESS` marker already exists SKIPS the recompute on replay —
  *    this is load-bearing, not an optimization: after the fold, a
  *    recompute would run against the contaminated index and OVERWRITE
  *    a correct result with an empty one;
  *  - the digest fold is idempotent by construction (the index probe's
  *    anti-join makes a replayed fold a no-op);
  *  - so every crash point replays cleanly: before the commit, the
  *    rewrite recomputes against the still-unfolded index; after it,
  *    the marker short-circuits to the (idempotent) fold.
  */
object StreamingExactSubstr {

  /** Drain available document files: rewrite each micro-batch against
    * the maintained index, append to the lake, fold digests. Re-invoke
    * on the same `checkpointDir` for steady-state drops. Pass
    * `maxFilesPerTrigger` to bound batch size (and in specs, to force
    * multi-batch drains).
    */
  def run(spark: SparkSession, inDir: String, schema: StructType,
          indexDir: String, tableDir: String, checkpointDir: String,
          w: Int = 8, expectedNdv: Long = 1000000L,
          maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader0 = spark.readStream.schema(schema)
    val reader = maxFilesPerTrigger
      .fold(reader0)(n => reader0.option("maxFilesPerTrigger", n))
    reader.parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.hadoop.fs.Path
        val s = batch.sparkSession
        val conf = s.sparkContext.hadoopConfiguration
        val idx = new Path(indexDir)
        val fs = idx.getFileSystem(conf)
        // first batch ever: seed an EMPTY index so the probe reads a
        // well-formed (possibly zero-file-row) digest table
        if (!fs.exists(idx))
          Dedup.buildDigestIndex(batch.filter(org.apache.spark.sql
              .functions.lit(false)),
            "text", "doc_id", w, indexDir, expectedNdv)
        val outDir = new Path(s"$tableDir/batch=$batchId")
        if (!fs.exists(new Path(outDir, "_SUCCESS"))) {
          Dedup.exactSubstrWithIndex(batch,
              Dedup.readDigestIndex(s, indexDir), "text", "doc_id", w)
            .write.mode("overwrite").parquet(outDir.toString)
        }
        Dedup.appendDigests(s, batch, "text", "doc_id", w, indexDir,
          expectedNdv)
        ()
      }
      .start()
  }

  /** The maintained deduped corpus (partition discovery; `batch`
    * surfaces as a partition column).
    */
  def readTable(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir)
}
