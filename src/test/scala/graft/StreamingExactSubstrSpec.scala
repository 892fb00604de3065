package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.llm.Dedup
import graft.streaming.StreamingExactSubstr

/** Streaming ExactSubstr maintenance: multi-batch drain equals the
  * chained d33 semantics (= from-scratch d31 restricted when ids are
  * stream-ordered), the index folds incrementally, and a re-drain over
  * the same checkpoint is a no-op.
  */
class StreamingExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, p: String) = (1 to n).map(i => s"$p$i")

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("two-batch drain == from-scratch rewrite; re-drain is a no-op") {
    val root = Registry.scratchDir("spec_stream_es")
    val in = s"$root/in"; val idx = s"$root/idx"
    val table = s"$root/table"; val ck = s"$root/ck"
    val passage = words(20, "sh")
    // drop 1 (becomes batch 0): the passage's first occurrence + a
    // clean doc. Part files land directly in `in` (the CorpusStreamSpec
    // staging recipe); the mtime gap orders the two drops for the
    // source's (timestamp, path) file ordering.
    Seq((0L, (words(4, "a") ++ passage).mkString(" ")),
        (1L, words(16, "b").mkString(" ")))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1500)
    // drop 2 (batch 1): repeats the passage AND batch-0's clean doc,
    // plus fresh text — both repeats must be cut via the INDEX alone
    Seq((10L, (passage ++ words(3, "c")).mkString(" ")),
        (11L, (words(16, "b") ++ words(2, "d")).mkString(" ")),
        (12L, words(9, "e").mkString(" ")))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    // maxFilesPerTrigger=1 forces one micro-batch per file drop
    StreamingExactSubstr.run(spark, in, schema, idx, table, ck,
        w = 8, expectedNdv = 10000L, maxFilesPerTrigger = Some(1))
      .drain()
    val got = StreamingExactSubstr.readTable(spark, table)
      .select(col("id"), col("clean_text"), col("n_spans_cut"),
        col("n_tokens_removed"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // equivalence: from-scratch full-corpus rewrite restricted to all
    // streamed docs (stream order == id order here)
    val all = Seq(
      (0L, (words(4, "a") ++ passage).mkString(" ")),
      (1L, words(16, "b").mkString(" ")),
      (10L, (passage ++ words(3, "c")).mkString(" ")),
      (11L, (words(16, "b") ++ words(2, "d")).mkString(" ")),
      (12L, words(9, "e").mkString(" "))).toDF("doc_id", "text")
    val full = Dedup.exactSubstrDedup(all, "text", "doc_id", w = 8)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == full)
    // the cross-batch cuts really happened via the index
    val byId = got.map(r => r._1 -> r._4).toMap
    assert(byId(10L) == 20L, "prior passage must cut from batch 1")
    assert(byId(11L) == 16L, "batch-0 doc repeated in batch 1 must cut")
    assert(byId(12L) == 0L)
    // index state = distinct digests of everything streamed
    val expectDigests = Dedup.windowDigests(all, "text", "doc_id", 8)
      .count()
    assert(Dedup.readDigestIndex(spark, idx).count() == expectDigests)
    // re-drain over the same checkpoint: no new batches, nothing changes
    val before = StreamingExactSubstr.readTable(spark, table).count()
    StreamingExactSubstr.run(spark, in, schema, idx, table, ck,
        w = 8, expectedNdv = 10000L, maxFilesPerTrigger = Some(1))
      .drain()
    assert(StreamingExactSubstr.readTable(spark, table).count() == before)
    assert(Dedup.readDigestIndex(spark, idx).count() == expectDigests)
    // provenance guard: a RESET checkpoint over the kept tableDir
    // restarts batch ids at 0 — the old batch=0 directory must fail
    // LOUDLY (a bare skip would silently drop the new batch while
    // still folding its digests)
    val freshCk = s"$root/ck2"
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingExactSubstr.run(spark, in, schema, idx, table, freshCk,
          w = 8, expectedNdv = 10000L, maxFilesPerTrigger = Some(1))
        .drain()
    }
    assert(ex.getMessage.contains("DIFFERENT stream incarnation") ||
      Option(ex.getCause).exists(_.getMessage != null &&
        ex.getCause.getMessage.contains("DIFFERENT stream incarnation")),
      ex.getMessage)
  }
}
