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

  test("portable HLL: useful accuracy AND bit-stable under repartitioning") {
    import spark.implicits._
    // 8000 distinct keys in one group, 100 in another
    val df = ((1 to 8000).map(i => ("big", s"u$i")) ++
      (1 to 100).map(i => ("small", s"v$i"))).toDF("g", "k")
    def run(parts: Int) = graft.functions.SketchStore
      .portableHllDistinct(df.repartition(parts), Seq("g"), "k")
      .orderBy("g").collect().toSeq
    val a = run(1); val b = run(8)
    // registers are per-bucket maxima: partitioning can never move a bit
    assert(a == b)
    val est = a.map(r => r.getString(0) -> r.getAs[Double]("approx_distinct")).toMap
    // p=9 standard error is 1.04/sqrt(512) ~ 4.6%; allow 4 sigma
    assert(math.abs(est("big") - 8000) / 8000.0 < 0.20, est.toString)
    // small-range correction keeps tiny groups accurate too
    assert(math.abs(est("small") - 100) / 100.0 < 0.15, est.toString)
  }

  test("portable Count-Min never undercounts and bounds overshoot on skew") {
    import spark.implicits._
    // heavy hitter (5000x) among 200 light items (10x each)
    val rows = Seq.fill(5000)("hot") ++
      (1 to 200).flatMap(i => Seq.fill(10)(s"item$i"))
    val df = rows.toDF("event_type")
    val sketch = graft.functions.SketchStore.portableCmSketch(df, "event_type")
    val exact = df.groupBy(col("event_type").as("item"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("exact_cnt"))
    val probed = graft.functions.SketchStore
      .portableCmProbe(exact.select("item"), sketch)
      .join(exact, "item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(probed.forall { case (_, est, ex) => est >= ex },
      "CM must never undercount")
    val (_, hotEst, hotEx) = probed.find(_._1 == "hot").get
    // the heavy hitter's row counters collide with at most the light mass
    assert(hotEst - hotEx <= 2000, s"hot overshoot ${hotEst - hotEx}")
  }
}
