package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch store — the pre-aggregation pattern that makes
  * "distinct users per X" answerable at 100 TB without re-reading
  * history. The raw corpus is scanned ONCE to materialize per-fine-grain
  * HLL sketches (a few KB per group); every coarser rollup afterwards is
  * a register-wise union over the sketch table — seconds over KBs
  * instead of hours over the corpus, and yesterday's sketches never
  * recompute. This works because Datasketches HLL state is a per-register
  * max: order-, partition- and merge-shape-independent, so
  * union(sketch(day1), sketch(day2)) has EXACTLY the registers of
  * sketch(day1 ∪ day2) at equal lgK — an equality `SketchStoreSpec`
  * asserts bit-for-bit, not approximately.
  *
  * Count-Min is the frequency-side counterpart: one (eps, confidence)
  * sketch answers "how often did item x occur" for ANY x with
  * one-sided error (never an undercount, overshoot ≤ eps·N with
  * probability ≥ confidence), in O(1/eps · ln(1/conf)) bytes total.
  *
  * Reference counterpart: `examples/visualize_data.py` recomputes
  * distinct-team counts from raw CSVs every run — this is that query
  * made incremental.
  */
object SketchStore {

  /** Materialize the fine-grained sketch table: one HLL sketch of
    * `itemCol` per group. The ONLY pass over raw data; one shuffle on
    * the group key carrying partial sketches (map-side combined).
    */
  def distinctSketches(df: DataFrame, groupCols: Seq[String],
                      itemCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(itemCol), lgK).as("sketch"))

  /** Roll the sketch table up to a coarser grain (any subset of the
    * sketch table's group columns, or none for a global count):
    * register-wise union + estimate. Touches only sketch bytes.
    */
  def rollupDistinct(sketches: DataFrame, groupCols: Seq[String]): DataFrame = {
    val est = round(hll_sketch_estimate(hll_union_agg(col("sketch"))))
      .cast("long").as("approx_distinct")
    if (groupCols.isEmpty) sketches.agg(est)
    else sketches.groupBy(groupCols.map(col): _*).agg(est)
  }

  /** EXACT counterpart of [[distinctSketches]]: ids partition into
    * 32k-id buckets, each group holds one ≤4 KB bitmap per touched
    * bucket. Same mergeable-store shape as HLL but exact — rollups OR
    * the bitmaps and sum popcounts, and yesterday's bitmaps never
    * recompute.
    */
  def bitmapTable(df: DataFrame, groupCols: Seq[String],
                  itemCol: String): DataFrame =
    df.select(groupCols.map(col) :+
        bitmap_bucket_number(col(itemCol)).as("bucket") :+
        bitmap_bit_position(col(itemCol)).as("pos"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(bitmap_construct_agg(col("pos")).as("bmp"))

  /** Roll a bitmap table (or a union of bitmap tables — the incremental
    * path) up to a coarser grain: OR per bucket, popcount, sum.
    */
  def bitmapRollup(bitmaps: DataFrame, groupCols: Seq[String]): DataFrame = {
    val ored = bitmaps
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(bitmap_or_agg(col("bmp")).as("bmp"))
    val cnt = sum(bitmap_count(col("bmp"))).cast("long")
      .as("distinct_items")
    if (groupCols.isEmpty) ored.agg(cnt)
    else ored.groupBy(groupCols.map(col): _*).agg(cnt)
  }

  /** Build a Count-Min frequency sketch of `itemCol` (as string) with the
    * given error bound. Distributed agg; the returned sketch is a few KB
    * regardless of data size. Fixed seed → deterministic estimates.
    */
  def cmBuild(df: DataFrame, itemCol: String, eps: Double = 0.001,
              confidence: Double = 0.99, seed: Int = 42): CountMinSketch =
    df.select(col(itemCol).cast("string").as("item"))
      .stat.countMinSketch("item", eps, confidence, seed)

  /** Probe the sketch for each row of `items`: (item, est). The sketch
    * broadcasts once and deserializes once per PARTITION, never per row —
    * the membership/frequency-probe shape that replaces a join against
    * the full frequency table.
    */
  def cmProbe(items: DataFrame, itemCol: String,
              sketch: CountMinSketch): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      sketch.writeTo(bos)
      bos.toByteArray
    }
    val bc = spark.sparkContext.broadcast(bytes)
    items.select(col(itemCol).cast("string")).as[String]
      .mapPartitions { it =>
        val cm = CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bc.value))
        it.map(s => (s, cm.estimateCount(s)))
      }.toDF("item", "est_cnt")
  }
}
