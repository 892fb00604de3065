package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two quantized
  * dimensions so that sorting by the combined value keeps 2-D-close rows
  * close in the file order. That turns parquet footer min/max statistics
  * into a 2-D index: a box predicate on (x, y) skips every file whose
  * [min,max]×[min,max] rectangle misses the box, where a linear sort by x
  * leaves the y statistics useless. This is the data-skipping layout
  * Delta/Iceberg call OPTIMIZE ZORDER BY — here as a plain column
  * expression plus a clustered parquet write, usable by any reader of
  * the same lake.
  *
  * Everything is integer arithmetic (shift/mask/or on non-negative
  * longs), so the z-value is bit-identical on any engine — the DuckDB
  * oracle replays the same magic-number spread.
  */
object ZOrder {

  val Bits = 16

  /** Spread the low 16 bits of a non-negative long onto the even bit
    * positions of a 32-bit lane (classic magic-number bit spread).
    */
  def spread16(v: Column): Column = {
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two values already quantized to [0, 2^16). */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Quantize a non-negative long to [0, 2^16) from an inclusive max
    * bound: `(v * 2^16) div (max+1)`. Expressed as subtract-remainder
    * division so the quotient is computed on an exactly-divisible pair —
    * bit-exact for v < 2^37, matching integer `//` on any engine.
    */
  def quantize(v: Column, maxInclusive: Column): Column = {
    val a = v * lit(1L << Bits)
    val b = maxInclusive + lit(1L)
    ((a - pmod(a, b)) / b).cast("long")
  }

  /** Z-ordered clustered write: quantize (xCol, yCol) against their
    * observed max (one tiny agg — at scale this is a metadata-cheap
    * column-stats read), range-partition by the z-value so each output
    * file owns a disjoint z-range, and sort within files so row-group
    * stats are tight too. The z column itself is dropped on write: the
    * layout, not an extra column, carries the index.
    */
  def writeZOrdered(df: DataFrame, dir: String, xCol: String, yCol: String,
                    nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val bounds = df.agg(max(col(xCol)).cast("long").as("mx"),
      max(col(yCol)).cast("long").as("my")).first()
    val (mx, my) = (bounds.getLong(0), bounds.getLong(1))
    df.withColumn("__graft_z",
        zValue(quantize(col(xCol).cast("long"), lit(mx)),
          quantize(col(yCol).cast("long"), lit(my))))
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(dir)
  }
}
