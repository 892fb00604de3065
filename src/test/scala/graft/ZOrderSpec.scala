package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Z-order layout: the scalar is oracle-checked (x20); this spec proves
  * the SKIPPING property the layout exists for, from the data itself —
  * per-file min/max (what a parquet reader gets from footers) admit far
  * fewer candidate files for 2-D and y-only predicates than a linear
  * sort by x over the same rows and file count.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val nFiles = 64
  private val side = 1 << 16

  // 65k uniform 2-D points, deterministic (hash of id, not rand()).
  private lazy val points: DataFrame = spark.range(side.toLong)
    .select(col("id"),
      pmod(xxhash64(col("id")), lit(side.toLong)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(side.toLong)).as("y"))

  /** Candidate files for a box predicate, decided exactly the way a
    * min/max-pruning reader does: file survives iff its [min,max] stats
    * rectangle intersects the box.
    */
  private def candidates(dir: String, x0: Long, x1: Long,
                         y0: Long, y1: Long): (Long, Long) = {
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"))
      .cache()
    val total = stats.count()
    val cand = stats.filter(col("xmin") <= x1 && col("xmax") >= x0 &&
      col("ymin") <= y1 && col("ymax") >= y0).count()
    stats.unpersist()
    (cand, total)
  }

  test("z-ordered files skip 2-D boxes a linear sort cannot") {
    val base = Files.createTempDirectory("graft-zorder").toString
    val zDir = s"$base/z"
    val linDir = s"$base/lin"
    ZOrder.writeZOrdered(points, zDir, "x", "y", nFiles)
    graft.sources.Lake.writeClustered(points, linDir, Seq("x"), nFiles)

    val eighth = side / 8 - 1
    // corner box, 1/8 × 1/8 of the space = one level-3 z quadrant
    val (zBox, zTotal) = candidates(zDir, 0, eighth, 0, eighth)
    val (lBox, lTotal) = candidates(linDir, 0, eighth, 0, eighth)
    assert(zTotal == nFiles && lTotal == nFiles)
    // z-order: the box is 1/64 of z-space → ~1 of 64 files (+ boundary)
    assert(zBox <= 3, s"z-order box candidates: $zBox")
    // linear-by-x still prunes on x (~1/8 of files), but no better
    assert(zBox < lBox)

    // y-only predicate: linear-by-x has useless y stats → ~all files;
    // z-order confines y<2^13 to 8 z-segments → a fraction survives
    val (zY, _) = candidates(zDir, 0, side - 1, 0, eighth)
    val (lY, _) = candidates(linDir, 0, side - 1, 0, eighth)
    assert(lY >= nFiles - 4, s"linear y-only candidates: $lY")
    assert(zY <= nFiles / 2, s"z-order y-only candidates: $zY")
  }

  test("z-ordered write produces disjoint per-file z-ranges") {
    val dir = Files.createTempDirectory("graft-zranges").toString
    ZOrder.writeZOrdered(points, dir, "x", "y", nFiles)
    // recompute z from (x, y) on read — the layout carries the index,
    // not a stored column — and check file z-intervals never overlap
    val ranges = spark.read.parquet(dir)
      .select(input_file_name().as("f"),
        ZOrder.zValue(col("x"), col("y")).as("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == nFiles)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
