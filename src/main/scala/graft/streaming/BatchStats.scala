package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Generic CONTINUOUS maintenance of a mergeable count-stats artifact —
  * the harness every incremental-stats member's streaming form shares
  * (KN trigram stats, tokenizer word frequencies, BM25 stats): each
  * micro-batch collapses to its stats frame and lands in its own
  * `statsDir/batch=N` partition directory with OVERWRITE semantics.
  *
  * Replay-idempotence is BY CONSTRUCTION, not by marker: addition is
  * not idempotent, directory overwrite is — a crash-replayed batch
  * rewrites its own partition with identical content instead of
  * double-counting. The merge happens at READ time ([[readMerged]]):
  * count-stats frames are type-bounded (they saturate under a bounded
  * vocabulary), so the grouped addition over all batch partitions is a
  * small aggregate however much data the stream has consumed — scored
  * history is never rescanned.
  *
  * Restarting from the same checkpoint replays cleanly; resetting the
  * checkpoint against a kept statsDir double-counts — use a fresh
  * statsDir when resetting, the StreamingExactSubstr contract.
  *
  * The batch directories grow unbounded over an infinite stream: the
  * grouped addition stays cheap (stats saturate) but FILE LISTING does
  * not at 10⁵ batches — [[compact]] folds a committed prefix of batch
  * partitions into one under the same overwrite-idempotence argument.
  */
object BatchStats {

  /** Start the loop: `statsOf(batch)` must yield a frame whose
    * non-`countCols` columns are grouping keys and whose counts merge
    * by addition (the knStats / WordFreq.stats / bm25Stats contract).
    */
  def start(stream: DataFrame, statsDir: String, checkpointDir: String)
           (statsOf: DataFrame => DataFrame): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        statsOf(batch.toDF())
          .write.mode("overwrite").parquet(s"$statsDir/batch=$batchId")
        ()
      }
      .start()

  /** The maintained artifact, merged at read time: one grouped
    * addition of `countCols` over every batch partition (the `batch`
    * partition column itself is dropped by the grouping).
    *
    * Before the FIRST micro-batch commits the directory is empty (or a
    * zero-row first batch wrote no part files) and parquet has no
    * schema to infer: pass `emptySchema` (key + count columns, the
    * shape `statsOf` emits) to get a well-typed EMPTY stats frame in
    * that window instead of an error; without it the read fails with a
    * message naming this precondition.
    */
  def readMerged(spark: SparkSession, statsDir: String,
                 keyCols: Seq[String], countCols: Seq[String],
                 emptySchema: Option[StructType] = None)
      : DataFrame = {
    require(countCols.nonEmpty, "BatchStats.readMerged: need count cols")
    val sums = countCols.map(c => sum(col(c)).as(c))
    val base =
      try spark.read.parquet(statsDir)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
              e.getMessage.contains("PATH_NOT_FOUND") =>
          emptySchema match {
            case Some(sc) => spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], sc)
            case None => throw new IllegalStateException(
              s"BatchStats.readMerged: $statsDir holds no committed " +
                "batch yet (empty dir / zero-row first batch) — pass " +
                "emptySchema to read an empty stats frame before the " +
                "first commit", e)
          }
      }
    base.groupBy(keyCols.map(col): _*).agg(sums.head, sums.tail: _*)
  }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def batchIds(spark: SparkSession, statsDir: String): Seq[Long] = {
    val f = fs(spark, statsDir)
    val root = new Path(statsDir)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
      .sorted
  }

  /** Fold every `batch=N` partition with `N <= upToBatch` into the
    * single partition `batch=<min folded id>` — the listing-cost valve
    * for infinite streams. The folded content is exactly
    * `readMerged`'s grouped addition over those partitions, so
    * compact-then-read ≡ read (spec-gated). Returns the folded ids
    * (empty = nothing to do; one partition is already compact).
    *
    * PRECONDITION (the same overwrite-idempotence argument the writer
    * rides): only compact batches the stream's CHECKPOINT has
    * committed past — a crash-replay of a folded batch id would
    * overwrite `batch=N` with that batch's own stats while the folded
    * partition still contains them: a double count. In steady state
    * any id < the checkpoint's latest committed batch qualifies.
    *
    * Crash safety: the fold writes to a dot-prefixed tmp dir (invisible
    * to parquet listing) carrying a `.compacted_through` marker (itself
    * committed by rename, so it is never torn), swaps it into place,
    * then deletes the folded sources. A crash mid-swap is repaired by
    * [[recover]] (also run at the start of every compact): the marker
    * names exactly which batch ids were folded, so recovery finishes
    * the swap and the deletes idempotently; an absent or unparseable
    * marker reads as "fold not committed" (tmp discarded, sources
    * intact). Every rename's boolean result is require-checked — Hadoop
    * reports failure as false, and proceeding past a failed swap would
    * delete sources whose fold only exists in the listing-invisible tmp.
    * Readers racing a mid-compact crash window can transiently
    * over/under-count — run compact from the maintenance path, not
    * concurrently with a reader, and recover before the next read.
    */
  def compact(spark: SparkSession, statsDir: String,
              keyCols: Seq[String], countCols: Seq[String],
              upToBatch: Long): Seq[Long] = {
    recover(spark, statsDir)
    val ids = batchIds(spark, statsDir).filter(_ <= upToBatch)
    if (ids.size < 2) return Seq.empty
    val f = fs(spark, statsDir)
    val tmp = new Path(statsDir, ".compact_tmp")
    if (f.exists(tmp)) f.delete(tmp, true)
    val sums = countCols.map(c => sum(col(c)).as(c))
    spark.read.parquet(ids.map(i => s"$statsDir/batch=$i"): _*)
      .groupBy(keyCols.map(col): _*).agg(sums.head, sums.tail: _*)
      .write.mode("overwrite").parquet(tmp.toString)
    // marker: which ids this fold covers — recovery's source of truth.
    // Written under a temp name and RENAMED into place (rename is the
    // commit): a crash mid-write leaves only the .tmp, which recover
    // treats as an incomplete fold (sources intact) instead of parsing
    // a torn marker and wedging every future compact.
    val markerTmp = new Path(tmp, ".compacted_through.tmp")
    val out = f.create(markerTmp, true)
    out.write(s"${ids.min} ${ids.max}".getBytes("UTF-8")); out.close()
    require(f.rename(markerTmp, new Path(tmp, ".compacted_through")),
      s"BatchStats.compact: marker rename failed under $tmp")
    val target = new Path(statsDir, s"batch=${ids.min}")
    f.delete(target, true)
    // Hadoop rename reports failure as FALSE, not an exception (the
    // Lake.scala discipline): abort BEFORE touching the other sources —
    // on failure the folded stats sit only in the dot-prefixed tmp
    // (invisible to parquet listing) and readMerged would silently
    // undercount after the source deletes below.
    require(f.rename(tmp, target),
      s"BatchStats.compact: rename $tmp -> $target failed; " +
        "folded sources left intact")
    ids.filter(_ != ids.min)
      .foreach(i => f.delete(new Path(statsDir, s"batch=$i"), true))
    ids
  }

  /** Finish an interrupted [[compact]]: if a complete `.compact_tmp`
    * (with its `.compacted_through` marker) is still present, swap it
    * into place; then delete any folded-source partitions the marker
    * covers that an interrupted delete pass left behind. Idempotent.
    */
  def recover(spark: SparkSession, statsDir: String): Unit = {
    val f = fs(spark, statsDir)
    val tmp = new Path(statsDir, ".compact_tmp")
    val tmpMarker = new Path(tmp, ".compacted_through")
    readMarker(f, tmpMarker) match {
      case Some((lo, hi)) =>
        val target = new Path(statsDir, s"batch=$lo")
        f.delete(target, true)
        require(f.rename(tmp, target),
          s"BatchStats.recover: rename $tmp -> $target failed; " +
            "folded sources left intact")
        ((lo + 1) to hi)
          .foreach(i => f.delete(new Path(statsDir, s"batch=$i"), true))
      case None if f.exists(tmp) =>
        // no marker, or a torn/unparseable one: the fold never
        // committed — discard the tmp, sources intact, next compact
        // simply redoes the fold
        f.delete(tmp, true)
      case None => ()
    }
    // a compacted partition's marker also cleans up leftover sources
    // (torn partition markers are skipped, not fatal — the partition's
    // content is already committed by its directory rename)
    batchIds(spark, statsDir).foreach { id =>
      readMarker(f, new Path(statsDir, s"batch=$id/.compacted_through"))
        .foreach { case (lo, hi) =>
          ((lo + 1) to hi).filter(_ != id)
            .foreach(i => f.delete(new Path(statsDir, s"batch=$i"), true))
        }
    }
  }

  /** Defensive marker read: None when the marker is absent or torn (a
    * crash mid-write must read as "fold not committed", never wedge).
    */
  private def readMarker(f: org.apache.hadoop.fs.FileSystem,
                         p: Path): Option[(Long, Long)] = {
    if (!f.exists(p)) return None
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val parts = txt.trim.split(" ")
    if (parts.length != 2) None
    else try Some((parts(0).toLong, parts(1).toLong))
    catch { case _: NumberFormatException => None }
  }
}
