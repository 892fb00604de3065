package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.llm.TextAnalysis
import graft.streaming.StreamingKnStats

/** Streaming KN-stats maintenance: the multi-batch fold equals the
  * whole-corpus fit, scoring from the maintained artifact equals the
  * batch refit, and a crash-replayed batch write is idempotent.
  */
class StreamingKnStatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("two-batch fold == whole-corpus stats; scoring from the " +
    "artifact == batch refit; batch replay is idempotent") {
    val root = Registry.scratchDir("spec_stream_kn")
    val in = s"$root/in"; val statsDir = s"$root/stats"
    val ck = s"$root/ck"
    val b1 = Seq((1L, "a b c a b c d e"), (2L, "x y z x y w"))
    val b2 = Seq((3L, "a b c d e f g"), (4L, "p q r a b c"))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1500) // mtime gap orders the drops into two batches
    b2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingKnStats.start(stream, "doc_id", "text", statsDir, ck)
    try q.processAllAvailable() finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("kind", "w1", "w2", "w3", "c")
        .orderBy("kind", "w1", "w2", "w3")
        .collect().map(_.toSeq).toSeq
    val whole = (b1 ++ b2).toDF("doc_id", "text")
    val wholeStats = TextAnalysis.knStats(whole, "doc_id", "text")
    assert(rows(StreamingKnStats.readStats(spark, statsDir)) ==
      rows(wholeStats))

    // scoring from the maintained artifact == refit on the whole corpus
    val probes = Seq((100L, "a b c x y"), (101L, "q q q q")).toDF(
      "doc_id", "text")
    def scored(stats: org.apache.spark.sql.DataFrame) =
      TextAnalysis.knScoreFromStats(probes, stats, "doc_id", "text")
        .orderBy("id").collect().map(_.toSeq).toSeq
    assert(scored(StreamingKnStats.readStats(spark, statsDir)) ==
      scored(wholeStats))

    // crash-replay: re-writing a batch partition (same content,
    // overwrite semantics) leaves the merged artifact unchanged —
    // the reason the fold is per-batch overwrite + merge-at-read,
    // never a mutated running total. The file source assigns batch
    // ids by mtime order, which coarse-mtime filesystems can flip —
    // so find b2's partition by CONTENT (the one whose stats equal a
    // b2 refit) instead of assuming it is batch=1.
    val b2Stats = TextAnalysis.knStats(b2.toDF("doc_id", "text"),
      "doc_id", "text")
    val b2Rows = rows(b2Stats)
    val b2Dir = new java.io.File(statsDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.toString)
      .find(d => rows(spark.read.parquet(d)) == b2Rows)
      .getOrElse(fail("no batch partition holds b2's stats"))
    b2Stats.write.mode("overwrite").parquet(b2Dir)
    assert(rows(StreamingKnStats.readStats(spark, statsDir)) ==
      rows(wholeStats))
  }

  test("live-corpus tokenizer refit: word-freq stats streamed through " +
    "BatchStats, refit-from-artifact == whole-corpus fit") {
    import graft.llm.{UnigramLm, WordFreq}
    import graft.streaming.BatchStats
    val root = Registry.scratchDir("spec_stream_wf")
    val in = s"$root/in"; val statsDir = s"$root/stats"
    val ck = s"$root/ck"
    val b1 = Seq((1L, "abab abba ab ba"), (2L, "baba ab abab"))
    val b2 = Seq((3L, "abba bb aa ab"), (4L, "ba ba abab"))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1500)
    b2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = BatchStats.start(stream, statsDir, ck)(
      WordFreq.stats(_, "text"))
    try q.processAllAvailable() finally q.stop()
    val maintained = BatchStats.readMerged(spark, statsDir,
      Seq("w"), Seq("c"))
    val p = UnigramLm.Params()
    assert(UnigramLm.fitFromStats(maintained, p) ==
      UnigramLm.fit((b1 ++ b2).toDF("doc_id", "text"), "text", p))
  }
}
