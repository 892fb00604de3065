package graft

/** Pins the two round-7 SQL surfaces added in RegistryR6: the LATERAL
  * correlated subquery with per-row ORDER BY + LIMIT (j23) and the
  * WITH RECURSIVE monthly spine (x29). Beyond "rows come back", each
  * test pins the property that matters at scale: j23 must decorrelate
  * to a single rank-window over one join (no nested-loop per-row
  * re-execution), and x29's recursion must stay driver-cheap (a ~80-row
  * spine) while the heavy side remains one aggregated scan.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("j23 lateral top-n decorrelates: window over join, no cartesian") {
    val df = SparkEntry.queries("j23_lateral_topn")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(plan.contains("Window"), plan.take(600))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // per-row LIMIT 2 semantics: no custkey appears more than twice,
    // and within a custkey prices are the top-2 (descending)
    val byCust = rows.groupBy(_.getLong(0))
    assert(byCust.values.forall(_.length <= 2))
    byCust.values.filter(_.length == 2).foreach { rs =>
      assert(rs.head.getDouble(2) >= rs.last.getDouble(2))
    }
  }

  test("j24/j25/j26/j28 EXISTS shapes decorrelate to semi/anti joins") {
    def plan(name: String): String = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    val q4 = plan("j24_tpch_q4")
    assert(q4.contains("LeftSemi"), q4.take(600))
    assert(!q4.contains("CartesianProduct"), q4.take(600))
    val q21 = plan("j25_tpch_q21")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"),
      q21.take(800))
    val q22 = plan("j26_tpch_q22")
    assert(q22.contains("LeftAnti"), q22.take(600))
    assert(!q22.contains("CartesianProduct"), q22.take(600))
    val q18 = plan("j28_tpch_q18")
    assert(q18.contains("LeftSemi"), q18.take(600))
  }

  test("date-cast filters unwrap and push into the parquet scan") {
    // CAST(ts AS DATE) >= DATE '...' must not defeat pushdown: Catalyst's
    // cast-unwrap rewrites it to timestamp bounds the scan can use. At
    // 100 TB this is the difference between reading 6 months and reading
    // everything — pin it so a filter rewrite can't regress it.
    val q4 = SparkEntry.queries("j24_tpch_q4")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q4.contains("GreaterThanOrEqual(o_orderdate"), q4.take(800))
    assert(q4.contains("LessThan(o_orderdate"), q4.take(800))
    val q12 = SparkEntry.queries("j29_tpch_q12")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q12.contains("GreaterThanOrEqual(l_shipdate"), q12.take(800))
  }

  test("j30 OR-of-ANDs pushes per-side halves into each scan") {
    val plan = SparkEntry.queries("j30_tpch_q19")(spark, sf)
      .queryExecution.executedPlan.toString
    // the brand/size disjunction is fully part-side → pushed to part;
    // the quantity disjunction is fully fact-side → pushed to lineitem
    assert(plan.contains("Or(EqualTo(p_brand,Brand#1)") ||
      plan.contains("Or(And(EqualTo(p_brand"), plan.take(1200))
    assert(plan.contains("l_quantity"), plan.take(1200))
  }

  test("j27 outer-join count distribution keeps zero-order customers") {
    val rows = SparkEntry.queries("j27_tpch_q13")(spark, sf).collect()
    // every customer lands in exactly one bucket
    val total = rows.map(_.getLong(1)).sum
    val custs = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(total == custs, s"$total != $custs")
    // the ON-clause filter guarantees a nonzero c_count=0 or low bucket
    // exists only if some customer has no non-urgent orders; either way
    // the distribution is non-degenerate (more than one bucket)
    assert(rows.length > 1)
  }

  test("x29 recursive spine is gap-free monthly calendar with LEFT join") {
    val df = SparkEntry.queries("x29_recursive_spine")(spark, sf)
    val rows = df.collect()
    // 1995-01 .. 2001-08 inclusive = 80 months, regardless of data
    assert(rows.length == 80, s"got ${rows.length}")
    val months = rows.map(_.getString(0))
    assert(months.head == "1995-01" && months.last == "2001-08")
    // gap-free: consecutive months differ by exactly one
    months.sliding(2).foreach { case Array(a, b) =>
      val Array(ay, am) = a.split("-").map(_.toInt)
      val Array(by, bm) = b.split("-").map(_.toInt)
      assert(by * 12 + bm - (ay * 12 + am) == 1, s"$a -> $b")
    }
    // LEFT-join gap-fill: zero-order months appear with orders = 0,
    // and at sf0.001 at least one month actually has orders
    assert(rows.exists(_.getLong(1) > 0))
    assert(rows.forall(_.getLong(1) >= 0))
  }
}
