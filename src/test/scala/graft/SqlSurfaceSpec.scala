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
