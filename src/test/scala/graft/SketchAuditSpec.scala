package graft

import org.apache.spark.sql.functions._

/** Quantitative floors for the sketch audits. The a24 registry row is
  * now a PARTIAL oracle (exact medians + a pinned rank-window
  * certificate, hash-checked against DuckDB); the raw GK estimate has
  * no DuckDB counterpart, so its accuracy claim is certified here.
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
    // the registry row's own certificate must hold
    for (r <- audit)
      assert(r.getAs[Boolean]("in_rank_window"), r.toString)
    // raw GK estimate (not in the oracle-checked row): rank certificate
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val est = orders.groupBy("o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, 0.5, 10000)")
        .as("approx_median"), count(lit(1)).as("n"))
      .collect()
    assert(est.nonEmpty)
    for (r <- est) {
      val prio = r.getAs[String]("o_orderpriority")
      val approx = r.getAs[Double]("approx_median")
      val n = r.getAs[Long]("n").toDouble
      val frac = orders.filter(col("o_orderpriority") === prio)
        .agg(avg((col("o_totalprice") <= approx).cast("double")))
        .head().getDouble(0)
      // 1/accuracy rank error + 2/n discreteness slack
      assert(math.abs(frac - 0.5) <= 1e-4 + 2.0 / n,
        s"$prio: frac-below $frac (n=$n, approx=$approx)")
    }
  }
}
