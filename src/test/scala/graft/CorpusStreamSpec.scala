package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.CorpusStream

/** Streaming corpus ingestion (streaming/CorpusStream.scala): two
  * AvailableNow drains over one checkpoint — the quality gate rejects
  * junk, the digest state drops an exact duplicate that arrives a DRAIN
  * LATER under a different id, per-batch directories make the sink
  * replay-idempotent, and an empty drain adds nothing.
  */
class CorpusStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private val good1 = ("the quick brown fox jumps over the lazy dog and " +
    "then it runs far away into the woods to rest for a while") // 24 toks
  private val good2 = ("a second perfectly ordinary document with enough " +
    "words in it to pass the length gate and the stopword gate too")
  private val junk = "!!! ??? !!! ??? !!! ???" // too short, all punct

  test("two-drain ingest: gate, cross-drain dedup, idempotent batches") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-cs-in").toString
    val table = Files.createTempDirectory("graft-cs-table").toString
    val cp = Files.createTempDirectory("graft-cs-cp").toString

    // drain 1: two good docs + junk
    Seq((1L, good1), (2L, junk), (3L, good2)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    CorpusStream.ingest(spark, in, schema, "text", table, cp)
      .drain()
    val t1 = CorpusStream.readTable(spark, table)
    assert(t1.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L))
    // quality rode along; digest column persisted for downstream audits
    assert(t1.columns.toSet ==
      Set("doc_id", "text", "quality", "digest", "batch"))

    // drain 2: an exact duplicate of good1 under a NEW id (must be
    // dropped by the checkpointed digest state), plus one fresh doc
    Seq((4L, good1), (5L, good2 + " extended further"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    CorpusStream.ingest(spark, in, schema, "text", table, cp)
      .drain()
    val t2 = CorpusStream.readTable(spark, table)
    assert(t2.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 5L))

    // drain 3: no new files — nothing changes, no new rows
    CorpusStream.ingest(spark, in, schema, "text", table, cp)
      .drain()
    assert(CorpusStream.readTable(spark, table).count() == 3L)

    // sink idempotency shape: every row lives under a batch=N directory
    val batches = CorpusStream.readTable(spark, table)
      .select("batch").distinct().collect().map(_.get(0).toString).toSet
    assert(batches.nonEmpty &&
      CorpusStream.readTable(spark, table)
        .groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
  }

  test("scoredIngest: stream-scored verdicts equal the batch scorer's " +
      "across two drains (train once, filter the stream)") {
    import spark.implicits._
    import graft.llm.LogReg
    // train the filter ONCE in batch on planted separable docs, persist
    val labeled = (0L until 60L).map { i =>
      val mark = if (i % 2 == 0) "goodmark" else "badmark"
      (i, i % 2 == 0, s"filler the and $mark tail${i % 7}")
    }.toDF("doc_id", "is_pos", "text")
    val w = LogReg.fit(LogReg.hashedCounts(labeled, "doc_id", "is_pos",
      "text", buckets = 16), iters = 10, lrDen = 4L)
    spark.catalog.clearCache() // fit's harness-scope feature cache
    val root = Registry.scratchDir("graft-cs-scored")
    val wDir = s"$root/w"; val in = s"$root/in"
    val table = s"$root/table"; val cp = s"$root/cp"
    LogReg.saveWeights(spark, w, wDir)

    // drain 1: one keeper, one reject
    val b1 = Seq((100L, "filler the and goodmark tail1"),
      (101L, "filler the and badmark tail2")).toDF("doc_id", "text")
    b1.coalesce(1).write.mode("append").parquet(in)
    CorpusStream.scoredIngest(spark, in, schema, "doc_id", "text",
      wDir, table, cp, buckets = 16).drain()
    val batchVerdicts1 = LogReg.scores(
        LogReg.features(b1, "doc_id", "text", buckets = 16), w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t1 = CorpusStream.readTable(spark, table)
      .select("doc_id", "score_micro")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t1.keySet == batchVerdicts1.filter(_._2 > 0L).keySet)
    assert(t1.forall { case (id, m) => batchVerdicts1(id) == m },
      "stream margins must equal the batch scorer's exactly")
    assert(t1.contains(100L) && !t1.contains(101L))

    // drain 2: only NEW files are scored; verdicts still batch-equal
    val b2 = Seq((200L, "filler the and goodmark tail3"),
      (201L, "filler the and badmark tail4"),
      (202L, "filler the and goodmark tail5")).toDF("doc_id", "text")
    b2.coalesce(1).write.mode("append").parquet(in)
    CorpusStream.scoredIngest(spark, in, schema, "doc_id", "text",
      wDir, table, cp, buckets = 16).drain()
    val batchVerdicts2 = LogReg.scores(
        LogReg.features(b2, "doc_id", "text", buckets = 16), w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t2 = CorpusStream.readTable(spark, table)
      .select("doc_id", "score_micro")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t2.keySet ==
      (batchVerdicts1.filter(_._2 > 0L).keySet ++
        batchVerdicts2.filter(_._2 > 0L).keySet))
    assert(t2.forall { case (id, m) =>
      batchVerdicts1.getOrElse(id, batchVerdicts2(id)) == m })

    // calibrated gate: a threshold above every margin rejects all —
    // the operating-point deployment path (keep iff m > thr)
    val root2 = Registry.scratchDir("graft-cs-thresh")
    val maxM = (batchVerdicts1.values ++ batchVerdicts2.values).max
    b1.coalesce(1).write.mode("append").parquet(s"$root2/in")
    CorpusStream.scoredIngest(spark, s"$root2/in", schema, "doc_id",
        "text", wDir, s"$root2/table", s"$root2/cp", buckets = 16,
        thresholdMicro = maxM).drain()
    assert(CorpusStream.readTable(spark, s"$root2/table").count() == 0L)
  }
}
