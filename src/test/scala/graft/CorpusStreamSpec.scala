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
      .awaitTermination(120000)
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
      .awaitTermination(120000)
    val t2 = CorpusStream.readTable(spark, table)
    assert(t2.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 5L))

    // drain 3: no new files — nothing changes, no new rows
    CorpusStream.ingest(spark, in, schema, "text", table, cp)
      .awaitTermination(120000)
    assert(CorpusStream.readTable(spark, table).count() == 3L)

    // sink idempotency shape: every row lives under a batch=N directory
    val batches = CorpusStream.readTable(spark, table)
      .select("batch").distinct().collect().map(_.get(0).toString).toSet
    assert(batches.nonEmpty &&
      CorpusStream.readTable(spark, table)
        .groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
  }
}
