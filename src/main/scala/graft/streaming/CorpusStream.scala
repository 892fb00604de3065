package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.llm.TextAnalysis

/** End-to-end STREAMING corpus ingestion — the composition the batch
  * registry proves piecewise (quality gate l09/t02, exact dedup d01/d12,
  * lake append), run continuously over document drops as they land:
  *
  *   parquet file stream → per-row quality gate → cross-batch exact
  *   dedup on the text digest → idempotent per-batch lake append.
  *
  * Design points, each inherited from a proven component:
  *  - the quality gate is [[TextAnalysis.qualityScore]] — pure per-row
  *    column arithmetic, so it rides the stream at scan speed with no
  *    state;
  *  - exact dedup is `dropDuplicates` on `md5(text)`: state is ONE
  *    32-hex digest per distinct accepted document (never text), the
  *    streaming form of d01/d12's digest dedup. Corpus dedup is
  *    deliberately unbounded-state — a duplicate must be caught however
  *    long ago the original arrived; at 100 TB the digest store is
  *    ~0.03% of corpus bytes. (For time-bounded semantics compose
  *    `dropDuplicatesWithinWatermark` instead, as `dedupedEvents` does.)
  *  - the sink is `foreachBatch` writing each micro-batch to its own
  *    `batch=<id>` subdirectory with wholesale overwrite — a REPLAYED
  *    batch (crash between write and checkpoint commit) overwrites its
  *    own directory instead of duplicating rows, the standard
  *    idempotent-sink recipe; readers see the table via plain partition
  *    discovery over `tableDir`.
  *
  * Near-dup (vs exact) streaming dedup stays in [[StreamingNearDup]] —
  * compose it downstream of this table when fuzzy semantics are needed.
  */
object CorpusStream {

  /** Start the AvailableNow ingestion pass: drain whatever document
    * files are in `inDir`, gate + dedup + append, then stop. Re-invoke
    * on the same `checkpointDir` to process only NEW files (steady-state
    * daily drops); duplicates of PREVIOUS drains stay dropped via the
    * checkpointed digest state.
    */
  def ingest(spark: SparkSession, inDir: String, schema: StructType,
             textCol: String, tableDir: String, checkpointDir: String,
             minQuality: Double = 0.5): StreamingQuery = {
    val gated = spark.readStream.schema(schema).parquet(inDir)
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
      .withColumn("digest", md5(col(textCol)))
      .dropDuplicates("digest")
    gated.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite")
          .parquet(s"$tableDir/batch=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The ingested corpus table (partition discovery over the per-batch
    * directories; `batch` surfaces as a partition column).
    */
  def readTable(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir)

  /** TRAINED-quality-filter ingestion — the production CCNet loop
    * composed from persisted artifacts: the classifier is fit ONCE in
    * batch ([[graft.llm.LogReg.fit]] → `saveWeights`), and every
    * micro-batch of the stream is scored against the LOADED weights
    * (read once at start, ≤ buckets+1 rows on the driver, broadcast
    * into each batch's plan) — predicted-positive documents land with
    * their integer margin as `score_micro`, the rest are dropped. The
    * verdicts are BY CONSTRUCTION identical to the batch scorer's
    * (`scores(features(docs))` is the same exact-integer plan, and the
    * gate is stateless per row), so a corpus filtered on the stream
    * equals the same corpus filtered in batch — spec-gated by the
    * two-drain CorpusStreamSpec protocol.
    *
    * The sink is the same idempotent per-batch overwrite as [[ingest]];
    * compose `dropDuplicates` upstream/downstream when dedup is also
    * wanted (kept orthogonal here — the filter is the member under
    * test, and state-free scoring replays for free).
    */
  def scoredIngest(spark: SparkSession, inDir: String, schema: StructType,
                   idCol: String, textCol: String, weightsDir: String,
                   tableDir: String, checkpointDir: String,
                   buckets: Int = 256,
                   thresholdMicro: Long = 0L): StreamingQuery = {
    val w = graft.llm.LogReg.loadWeights(spark, weightsDir)
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val verdicts = graft.llm.LogReg.scores(
          graft.llm.LogReg.features(batch, idCol, textCol, buckets), w)
        // keep iff margin > thresholdMicro — the default 0 is the raw
        // classifier sign; a deployment passes the calibrated operating
        // point (LogReg.operatingPoint's thr_micro − 1: the sweep's
        // "keep iff m ≥ thr" is this gate at thresholdMicro = thr − 1)
        batch.join(verdicts.filter(col("m") > thresholdMicro)
            .select(col("id").as(idCol), col("m").as("score_micro")),
          idCol)
          .write.mode("overwrite").parquet(s"$tableDir/batch=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
