package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.streaming.BatchStats

/** BatchStats artifact maintenance: empty-dir reads, compaction
  * (compact-then-read ≡ read, idempotent re-compact), and crash
  * recovery of an interrupted compact.
  */
class BatchStatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("w", StringType),
    StructField("c", LongType)))

  private def writeBatch(dir: String, id: Long, rows: Seq[(String, Long)])
      : Unit =
    rows.toDF("w", "c").write.mode("overwrite")
      .parquet(s"$dir/batch=$id")

  private def merged(dir: String) =
    BatchStats.readMerged(spark, dir, Seq("w"), Seq("c"),
        emptySchema = Some(schema))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq

  test("readMerged on an empty statsDir returns an empty typed frame " +
      "with emptySchema, fails with a named precondition without") {
    val dir = Registry.scratchDir("spec_bs_empty") + "/stats"
    new java.io.File(dir).mkdirs()
    assert(merged(dir) == Seq.empty)
    val e = intercept[IllegalStateException] {
      BatchStats.readMerged(spark, dir, Seq("w"), Seq("c")).collect()
    }
    assert(e.getMessage.contains("emptySchema"), e.getMessage)
  }

  test("compact folds a committed prefix: compact-then-read ≡ read, " +
      "re-compact is a no-op, later batches untouched") {
    val dir = Registry.scratchDir("spec_bs_compact") + "/stats"
    writeBatch(dir, 0, Seq("a" -> 2L, "b" -> 1L))
    writeBatch(dir, 1, Seq("a" -> 3L, "c" -> 5L))
    writeBatch(dir, 2, Seq("b" -> 4L))
    writeBatch(dir, 3, Seq("a" -> 1L, "d" -> 7L)) // beyond the fold
    val before = merged(dir)
    val folded = BatchStats.compact(spark, dir, Seq("w"), Seq("c"),
      upToBatch = 2)
    assert(folded == Seq(0L, 1L, 2L))
    assert(merged(dir) == before) // compact-then-read ≡ read
    // folded into batch=0; 1 and 2 gone; 3 untouched
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    assert(dirs == Seq("batch=0", "batch=3"))
    // idempotent: a second compact over the same range has one
    // partition left and does nothing
    assert(BatchStats.compact(spark, dir, Seq("w"), Seq("c"), 2) ==
      Seq.empty)
    assert(merged(dir) == before)
  }

  test("recover finishes an interrupted compact (tmp written, swap not " +
      "done) and cleans folded leftovers") {
    val dir = Registry.scratchDir("spec_bs_recover") + "/stats"
    writeBatch(dir, 0, Seq("a" -> 1L))
    writeBatch(dir, 1, Seq("a" -> 2L, "b" -> 3L))
    val before = merged(dir)
    // simulate the crash: the fold landed in .compact_tmp with its
    // marker, but the swap/delete never ran
    Seq("a" -> 3L, "b" -> 3L).toDF("w", "c").write
      .mode("overwrite").parquet(s"$dir/.compact_tmp")
    val f = new java.io.FileOutputStream(s"$dir/.compact_tmp/.compacted_through")
    f.write("0 1".getBytes("UTF-8")); f.close()
    BatchStats.recover(spark, dir)
    assert(merged(dir) == before)
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    assert(dirs == Seq("batch=0"))
    assert(!new java.io.File(s"$dir/.compact_tmp").exists())
  }

  test("recover treats a TORN marker as an uncommitted fold: tmp " +
      "discarded, sources intact, the next compact succeeds") {
    val dir = Registry.scratchDir("spec_bs_torn") + "/stats"
    writeBatch(dir, 0, Seq("a" -> 1L))
    writeBatch(dir, 1, Seq("b" -> 2L))
    val before = merged(dir)
    // a crash mid-marker-write left a partial "0 " (the writer now
    // commits the marker by rename, but recovery must stay defensive —
    // an unparseable marker must read as "fold not committed", never
    // wedge every future compact on a parse error)
    Seq("a" -> 1L, "b" -> 2L).toDF("w", "c").write
      .mode("overwrite").parquet(s"$dir/.compact_tmp")
    val f = new java.io.FileOutputStream(
      s"$dir/.compact_tmp/.compacted_through")
    f.write("0 ".getBytes("UTF-8")); f.close()
    BatchStats.recover(spark, dir)
    assert(!new java.io.File(s"$dir/.compact_tmp").exists())
    assert(merged(dir) == before) // sources intact, no double count
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    assert(dirs == Seq("batch=0", "batch=1"))
    // the redone compact (which runs recover first) folds normally
    assert(BatchStats.compact(spark, dir, Seq("w"), Seq("c"), 1L) ==
      Seq(0L, 1L))
    assert(merged(dir) == before)
  }
}
