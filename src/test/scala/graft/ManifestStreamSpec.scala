package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.llm.{CorpusPipeline, ShardManifest}
import graft.streaming.{BatchStats, ManifestStream}

/** Streaming shard-manifest maintenance (streaming/ManifestStream):
  * the two-batch streamed fold equals the whole-corpus manifest (the
  * t18 lossless trick), a crash-replayed batch write is idempotent,
  * and compaction preserves the manifest.
  */
class ManifestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def doc(i: Long): (Long, String) =
    (i, (0 to (i % 7).toInt).map(j => s"w${(i + j) % 11}").mkString(" "))

  private def rows(df: DataFrame) =
    df.select("shard", "n_bins", "n_docs", "n_tokens", "checksum")
      .orderBy("shard").collect().map(_.toSeq).toSeq

  test("two-batch streamed fold == whole-corpus manifest; batch replay " +
      "idempotent; compaction preserves the manifest") {
    // batches ALIGN TO PACK-BLOCK BOUNDARIES (blockSize 256): block =
    // id div 256 is id-derived and packing is per-block, so
    // block-aligned drops pack identically to the whole-corpus pack —
    // the documented l24 precondition this harness inherits
    val b1 = (0L until 256L).map(doc)    // exactly block 0
    val b2 = (256L until 500L).map(doc)  // block 1
    val root = Registry.scratchDir("spec_manifest_stream")
    val in = s"$root/in"; val statsDir = s"$root/stats"
    val ck = s"$root/ck"
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1500) // mtime gap orders the drops into two batches
    b2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = ManifestStream.start(stream, statsDir, ck,
      nShards = 5, capacity = 40)
    try q.processAllAvailable() finally q.stop()

    val whole = (b1 ++ b2).toDF("doc_id", "text")
    val wholeManifest = ShardManifest.manifest(
      CorpusPipeline.packSequences(whole, capacity = 40), nShards = 5)
    assert(rows(ManifestStream.readManifest(spark, statsDir)) ==
      rows(wholeManifest))

    // crash replay: re-writing a batch partition with its own stats
    // (overwrite semantics) leaves the manifest unchanged. Find b2's
    // partition by CONTENT (file-source batch ids follow mtime order,
    // which coarse-mtime filesystems can flip).
    def statRows(df: DataFrame) =
      df.select("shard", "bkey", "n_docs", "n_tokens", "checksum")
        .orderBy("shard", "bkey").collect().map(_.toSeq).toSeq
    val b2Stats = ShardManifest.binStats(
      CorpusPipeline.packSequences(b2.toDF("doc_id", "text"),
        capacity = 40), nShards = 5)
    val b2Rows = statRows(b2Stats)
    val b2Dir = new java.io.File(statsDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.toString)
      .find(d => statRows(spark.read.parquet(d)) == b2Rows)
      .getOrElse(fail("no batch partition holds b2's bin stats"))
    b2Stats.write.mode("overwrite").parquet(b2Dir)
    assert(rows(ManifestStream.readManifest(spark, statsDir)) ==
      rows(wholeManifest))

    // compaction interop: fold every committed partition, manifest
    // unchanged (compact-then-read ≡ read, here through the rollup)
    val folded = ManifestStream.compact(spark, statsDir, upToBatch = 99L)
    assert(folded.size == 2, folded.toString)
    assert(rows(ManifestStream.readManifest(spark, statsDir)) ==
      rows(wholeManifest))

    // the maintained artifact also serves the bin-stats granularity:
    // merged bin stats == whole-corpus binStats (the l24 equality)
    val mergedStats = BatchStats.readMerged(spark, statsDir,
      Seq("shard", "bkey"), Seq("n_docs", "n_tokens", "checksum"))
    val wholeStats = ShardManifest.binStats(
      CorpusPipeline.packSequences(whole, capacity = 40), nShards = 5)
    assert(statRows(mergedStats) == statRows(wholeStats))
  }
}
