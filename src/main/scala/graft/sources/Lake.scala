package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet lake layout — the storage shape that
  * makes a 100 TB fact table queryable: facts land under
  * `dir/<col>=<value>/...`, and a reader whose predicate touches the
  * partition column prunes whole directories at PLANNING time (the scan's
  * `PartitionFilters`), so untouched partitions cost zero I/O — no file
  * is even listed, let alone opened.
  *
  * Mirrors the reference's per-day append layout
  * (`daily_match_scraper.py`: one CSV per target date) re-expressed as
  * the idiomatic lake pattern.
  */
object Lake {

  /** Write a fact partitioned by the given columns (dynamic overwrite:
    * only partitions present in `df` are replaced, the rest of the lake
    * is untouched — the daily-append contract).
    */
  def writePartitioned(df: DataFrame, dir: String,
                       partitionCols: Seq[String]): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dir)

  /** Read back with partition-column filters applied; Spark prunes the
    * directory tree before any file I/O.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Schema-evolution read: reconcile files written under DIFFERENT
    * schema versions (the steady state of any long-lived lake table —
    * columns get added over time) into their union, with nulls where a
    * file predates a column. `mergeSchema` pays one footer read per file
    * at planning time, which is why it is NOT the default read path:
    * turn it on for evolved tables, fix the table by compaction when the
    * footer pass starts to dominate planning.
    */
  def readMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Small-file compaction — the classic lake maintenance op: a daily
    * append pattern leaves thousands of KB-sized parquet files whose
    * footer and task-scheduling overhead dominate scans. Rewrites the
    * table to `dstDir` in ~`targetBytes` outputs, sized from the ACTUAL
    * on-disk bytes (not a guess), preserving the partition layout.
    * Compact-to-copy (caller swaps directories) so a failed compaction
    * never corrupts the live table.
    */
  def compactTo(spark: SparkSession, srcDir: String, dstDir: String,
                targetBytes: Long = 128L * 1024 * 1024,
                partitionCols: Seq[String] = Nil): Unit = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val path = new org.apache.hadoop.fs.Path(srcDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    var bytes = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(srcDir)
    val writer =
      (if (partitionCols.nonEmpty) {
        // Per-partition file sizing. Repartitioning on the partition
        // columns alone would hash every row of a partition value to ONE
        // task — a skewed partition bigger than targetBytes would still
        // become a single oversized file. Instead: size each partition's
        // file count from its estimated bytes (row share of the measured
        // on-disk total) and spread rows across that many salt buckets,
        // so a hot partition splits while small partitions stay one file.
        val pcols = partitionCols.map(col)
        val stats = df.groupBy(pcols: _*).agg(count(lit(1)).as("__graft_rows"))
        val totalRows =
          math.max(1L, stats.agg(sum("__graft_rows")).first().getLong(0))
        val bytesPerRow = bytes.toDouble / totalRows
        val nf = stats.withColumn("__graft_nf",
          greatest(lit(1L), ceil(col("__graft_rows") * lit(bytesPerRow) /
            lit(targetBytes.toDouble)))).drop("__graft_rows")
        // nf has one row per partition value: always broadcast-sized.
        // Equality join misses null partition values → coalesce to 1 file.
        // Shuffle width ~2× the total file budget so distinct
        // (partition, bucket) pairs rarely hash to the same task (a
        // collision merges two intended files back into one).
        val sumNf = nf.agg(sum("__graft_nf")).first().getLong(0)
        val width = math.max(spark.sessionState.conf.numShufflePartitions,
          math.min(2 * sumNf, 10000L).toInt)
        df.join(broadcast(nf), partitionCols, "left")
          .withColumn("__graft_bucket",
            pmod(xxhash64(monotonically_increasing_id()),
              coalesce(col("__graft_nf"), lit(1L))))
          .drop("__graft_nf")
          .repartition(width, pcols :+ col("__graft_bucket"): _*)
          .drop("__graft_bucket")
          .write.partitionBy(partitionCols: _*)
      } else df.repartition(nFiles).write)
    writer.mode("overwrite").parquet(dstDir)
  }

  /** Bloom-filtered write — the data-skipping layout for POINT lookups
    * on high-cardinality keys that no sort order serves (doc_id probes
    * on a time-clustered table, url-hash lookups): a per-row-group
    * parquet bloom filter lets the reader skip row groups that provably
    * don't contain the probed value even when every row group's min/max
    * RANGE covers it (the case where [[writeClustered]]'s stats are
    * useless — the key is interleaved across files). Dictionary encoding
    * is disabled for the bloom columns: at lake scale a high-cardinality
    * key's dictionary pages blow past their size cap anyway (falling
    * back to plain encoding with NO skipping structure), and parquet
    * readers prefer the dictionary over the bloom when both exist —
    * so the bloom is the structure that actually serves the probe.
    * `expectedNdv` sizes the filter (~1.1 bytes/key at the default 1%
    * FPP); undersizing inflates false positives, never correctness.
    * `LakeSpec` proves the skip from the reader's own scan metrics.
    */
  def writeBloomFiltered(df: DataFrame, dir: String,
                         bloomCols: Seq[String], expectedNdv: Long,
                         nFiles: Int = 0,
                         mode: String = "overwrite"): Unit = {
    require(bloomCols.nonEmpty, "writeBloomFiltered: no bloom columns")
    require(expectedNdv > 0, s"expectedNdv must be positive: $expectedNdv")
    val base = (if (nFiles > 0) df.repartition(nFiles) else df).write
    bloomCols.foldLeft(base) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c",
          expectedNdv.toString)
        .option(s"parquet.enable.dictionary#$c", "false")
    }.mode(mode).parquet(dir)
  }

  /** Sort-clustered write — the data-skipping layout for NON-partition
    * columns: `repartitionByRange` gives every output file a disjoint
    * value range of the cluster keys, and `sortWithinPartitions` orders
    * rows inside each file, so parquet footer min/max statistics become
    * tight and any reader (Spark's row-group filter, or an external
    * engine reading the same lake) skips whole files/row-groups for a
    * range or point predicate. Partitioning handles the coarse key
    * (date); clustering handles the high-cardinality one (price, id,
    * embedding bucket) where one-directory-per-value is impossible.
    * `LakeSpec` proves the property from the data itself: per-file
    * [min,max] of the cluster key are pairwise disjoint.
    */
  def writeClustered(df: DataFrame, dir: String, clusterCols: Seq[String],
                     nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.repartitionByRange(nFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(dir)
  }

  /** Derive a `month` partition column (yyyy-MM) from a date column —
    * day-level partitioning over years of data produces thousands of
    * tiny directories; month is the usual balance.
    */
  /** Streaming incremental MERGE maintenance: a change-log stream kept
    * folded into a lake table via `foreachBatch` + [[graft.etl.Merge.upsert]]
    * — the end-to-end shape of every CDC-fed training-data table (inserts,
    * updates and tombstone deletes arrive continuously; the table stays
    * query-ready between batches).
    *
    * Each micro-batch rewrites the table via write-NEW-then-swap: the
    * merged result lands in a fresh `<table>.tmp-<batch>` directory and is
    * swapped into place, because Spark cannot overwrite a path it is
    * lazily reading in the same job. On a real object store the rename
    * becomes a manifest/metadata pointer flip (Delta/Iceberg commit); the
    * directory swap is the filesystem equivalent, and exactly-once comes
    * from the checkpoint: a replayed batch re-merges idempotently
    * (upsert's winner-per-key is deterministic).
    *
    * The swap is crash-safe: the live dir is renamed ASIDE
    * (`<table>.old-<batch>`) — never deleted — before the tmp dir is
    * renamed into place, every rename's boolean result is checked (a
    * false fails the batch instead of reporting success over a deleted
    * table), and batch start restores the newest aside if a previous
    * attempt died between the two renames. At no instant does the merged
    * state exist only in a deleted directory.
    *
    * Trigger is AvailableNow: drains what exists, then stops — the same
    * call pattern works for a cron'd incremental job or a long-lived
    * stream (swap the trigger).
    */
  def maintainUpsert(spark: SparkSession, changesDir: String,
                     changeSchema: org.apache.spark.sql.types.StructType,
                     tableDir: String, checkpointDir: String,
                     keys: Seq[String], versionCol: Option[String] = None,
                     deleteCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    val dropCols = deleteCol.toSeq
    spark.readStream.schema(changeSchema).parquet(changesDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.hadoop.fs.Path
        val s = batch.sparkSession
        val dir = new Path(tableDir)
        val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
        // Recovery: a prior attempt may have died between moving the
        // live table aside and completing the swap. If the live dir is
        // missing but asides exist, the newest aside IS the table —
        // restore it before reading the base (otherwise the replayed
        // batch would silently rebuild the table from itself alone,
        // losing all previously merged state). Asides left after a
        // COMPLETED swap (died before cleanup) are just deleted.
        def asides(): Array[org.apache.hadoop.fs.FileStatus] =
          Option(fs.globStatus(new Path(s"$tableDir.old-*")))
            .getOrElse(Array.empty)
        def asideBatch(p: Path): Long =
          p.getName.substring(p.getName.lastIndexOf("old-") + 4).toLong
        if (!fs.exists(dir)) {
          val found = asides()
          if (found.nonEmpty) {
            val newest = found.maxBy(st => asideBatch(st.getPath))
            require(fs.rename(newest.getPath, dir),
              s"recovery rename ${newest.getPath} -> $dir failed")
          }
        }
        asides().foreach(st => fs.delete(st.getPath, true))
        val base =
          if (fs.exists(dir)) s.read.parquet(tableDir)
          else dropCols.foldLeft(batch.filter(lit(false)))(_ drop _)
        val merged = graft.etl.Merge.upsert(base, batch, keys,
          versionCol, deleteCol)
        val tmp = new Path(s"$tableDir.tmp-$batchId")
        merged.write.mode("overwrite").parquet(tmp.toString)
        // Swap: live -> aside, tmp -> live, then drop the aside. Each
        // rename is checked; a failure aborts the batch with the table
        // still reachable (live, or the just-created aside).
        val old = new Path(s"$tableDir.old-$batchId")
        if (fs.exists(dir)) {
          if (fs.exists(old)) fs.delete(old, true) // stale same-batch retry
          require(fs.rename(dir, old), s"rename $dir -> $old failed")
        }
        require(fs.rename(tmp, dir), s"rename $tmp -> $dir failed")
        if (fs.exists(old)) fs.delete(old, true)
        ()
      }
      .start()
  }

  def withMonth(df: DataFrame, dateCol: String): DataFrame =
    df.withColumn("month", date_format(col(dateCol), "yyyy-MM"))
}
