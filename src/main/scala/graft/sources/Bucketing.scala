package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the standing answer to "this fact↔fact
  * join shuffles both sides every run" at 100 TB. Writing both sides
  * bucketed (and sorted) by the join key fixes the partitioning ON DISK:
  * every subsequent equi-join on that key reads co-located buckets and
  * the planner drops both Exchanges (and, with sorted buckets, both
  * Sorts) from the sort-merge join. One write-time shuffle is amortized
  * over every downstream join/aggregation on the key — the Spark-native
  * equivalent of the partitioned layouts OLAP engines maintain.
  *
  * The reference re-reads its CSV outputs and re-groups per run
  * (`processors/data_processor.py` pipeline); at scale that layout IS the
  * optimization, so the engine ships it as a first-class sink.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table. `buckets` should be
    * sized so one bucket ≈ one task's worth of data at target scale
    * (buckets = totalBytes / ~256 MB is a sane start).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key. With matching
    * bucket counts the physical plan is a zero-Exchange sort-merge join
    * (asserted in `BucketingSpec`).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
