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
  *  - each batch publishes its own `batch=<id>` directory via
  *    write-tmp-then-rename, with a checkpoint-provenance marker
  *    (`_graft_ckpt`) inside — an already-published directory SKIPS
  *    the recompute on replay. Load-bearing, not an optimization:
  *    after the fold, a recompute would run against the contaminated
  *    index and OVERWRITE a correct result with an empty one;
  *  - the marker carries WHICH checkpoint committed the directory: a
  *    reset checkpoint over a kept tableDir restarts batch ids at 0,
  *    and a bare skip guard would silently drop the new batch while
  *    still poisoning the index with its digests — a provenance
  *    mismatch fails loudly instead;
  *  - the digest fold is idempotent by construction (the index probe's
  *    anti-join makes a replayed fold a no-op) and runs strictly AFTER
  *    the publish rename, so every crash point replays cleanly:
  *    before the rename the index is still unfolded (recompute is
  *    correct); after it the marker short-circuits to the fold.
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
        // Provenance marker: batch ids restart at 0 when an operator
        // resets checkpointDir but keeps tableDir — a bare _SUCCESS
        // skip would then silently drop the NEW batch 0 (its documents
        // never land) while the fold below still poisons the index
        // with their digests. The marker records which checkpoint
        // committed the directory; a mismatch fails LOUDLY instead.
        def readMarker(dir: Path): Option[String] = {
          val m = new Path(dir, "_graft_ckpt")
          if (!fs.exists(m)) None
          else {
            val in = fs.open(m)
            try Some(new String(in.readAllBytes(), "UTF-8"))
            finally in.close()
          }
        }
        val committed = readMarker(outDir)
        if (committed.isEmpty) {
          require(!fs.exists(outDir),
            s"$outDir exists without a provenance marker (a different " +
              "stream incarnation or manual writes); refusing to " +
              "overwrite — clean tableDir or use a fresh one")
          // Commit via write-tmp-then-rename so there is NO crash
          // window in which the result looks committed but isn't (or
          // vice versa): the marker lands INSIDE tmp after the parquet
          // job commits, the rename publishes both atomically, and the
          // fold runs strictly after. Every crash point replays
          // cleanly — before the rename the index is still unfolded
          // (recompute is correct); after it the marker short-circuits
          // to the idempotent fold. The dot-prefixed tmp dir is hidden
          // from readers' partition discovery.
          //
          // REQUIRES an atomic-directory-rename filesystem (local,
          // HDFS). On object stores (S3A) rename is a non-atomic copy:
          // a crash mid-"rename" can leave a PARTIAL outDir without a
          // marker, which the no-marker guard above then reports as a
          // foreign write — a loud permanent failure needing manual
          // cleanup of that batch dir, never silent corruption. For an
          // object-store deployment put tableDir on an atomic-commit
          // layer instead of raw S3 paths.
          val tmp = new Path(s"$tableDir/.tmp-batch-$batchId")
          // per-batch scope: the rewrite's tracked fingerprint cache
          // must release once the batch commits (the process-global
          // harness scope would leak one cached digest table per
          // micro-batch for the stream's lifetime)
          val scope = new graft.CacheScope
          try {
            Dedup.exactSubstrWithIndex(batch,
                Dedup.readDigestIndex(s, indexDir), "text", "doc_id", w,
                scope)
              .write.mode("overwrite").parquet(tmp.toString)
            val out = fs.create(new Path(tmp, "_graft_ckpt"), true)
            try out.write(checkpointDir.getBytes("UTF-8"))
            finally out.close()
          } finally scope.release()
          require(fs.rename(tmp, outDir), s"rename $tmp -> $outDir failed")
        } else require(committed.contains(checkpointDir),
          s"$outDir was committed by a DIFFERENT stream incarnation " +
            s"(checkpoint ${committed.get}); refusing to skip or " +
            "overwrite — clean tableDir or use a fresh one when " +
            "resetting the checkpoint")
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
