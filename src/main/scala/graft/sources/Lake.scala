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

  /** Derive a `month` partition column (yyyy-MM) from a date column —
    * day-level partitioning over years of data produces thousands of
    * tiny directories; month is the usual balance.
    */
  def withMonth(df: DataFrame, dateCol: String): DataFrame =
    df.withColumn("month", date_format(col(dateCol), "yyyy-MM"))
}
