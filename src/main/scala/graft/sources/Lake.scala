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
      (if (partitionCols.nonEmpty)
        // spread within each partition; output files land per partition dir
        df.repartition(nFiles, partitionCols.map(col): _*)
          .write.partitionBy(partitionCols: _*)
      else df.repartition(nFiles).write)
    writer.mode("overwrite").parquet(dstDir)
  }

  /** Derive a `month` partition column (yyyy-MM) from a date column —
    * day-level partitioning over years of data produces thousands of
    * tiny directories; month is the usual balance.
    */
  def withMonth(df: DataFrame, dateCol: String): DataFrame =
    df.withColumn("month", date_format(col(dateCol), "yyyy-MM"))
}
