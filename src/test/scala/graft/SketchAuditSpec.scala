package graft

import org.apache.spark.sql.functions._

/** Quantitative floors for the rows-only sketch audits: no DuckDB oracle
  * can hash-match an approximate sketch, so the accuracy claim is pinned
  * here instead (the a16 HLL audit methodology, applied to quantiles).
  *
  * The bound is in RANK space — that is what approx_percentile's
  * accuracy parameter guarantees (rank error ≤ 1/accuracy). Value-space
  * deltas vs the interpolating exact `percentile` are NOT a sketch
  * error: the sketch returns an actual data element, `percentile`
  * interpolates between two, and the gap between adjacent values near
  * the median is a property of the data, not the algorithm.
  */
class SketchAuditSpec extends SparkSpec {

  test("a24: approx median sits within rank ε of 0.5 in every group") {
    val audit = Registry.queries("a24_quantile_audit")(spark, sf).collect()
    assert(audit.nonEmpty)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    for (r <- audit) {
      val prio = r.getAs[String]("o_orderpriority")
      val approx = r.getAs[Double]("approx_median")
      val n = r.getAs[Long]("n").toDouble
      val frac = orders.filter(col("o_orderpriority") === prio)
        .agg(avg((col("o_totalprice") <= approx).cast("double")))
        .head().getDouble(0)
      // 1/accuracy rank error + 2/n discreteness slack
      assert(math.abs(frac - 0.5) <= 1e-4 + 2.0 / n,
        s"$prio: frac-below $frac (n=$n, approx=$approx)")
      // loose value-space sanity only: the medians are the same scale
      assert(r.getAs[Double]("rel_err") < 0.05, r.toString)
    }
  }
}
