package graft

import org.apache.spark.sql.functions._

import graft.etl.TeamMetrics

/** A1–A3 rolling-window parity with pandas `rolling('90D',
  * min_periods=1)` (`utils/data_utils.py:238-301`, SURVEY §7.4): window
  * is [t-90d, t] inclusive both ends, time-based, duplicate dates are
  * peers, min_periods=1.
  */
class TeamMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val history = Seq(
    // team, date, goals_for, result
    ("A", "2025-01-01", 1.0, "W"),
    ("A", "2025-01-31", 3.0, "D"),
    ("A", "2025-04-01", 2.0, "L"), // exactly 90d after 01-01 → inclusive
    ("A", "2025-04-02", 4.0, "W"), // 01-01 now out of window
    ("A", "2025-04-02", 6.0, "L"), // duplicate date: peer of previous row
    ("B", "2025-01-15", 5.0, "W")  // other team, isolated partition
  ).toDF("team", "date", "goals_for", "result")
    .withColumn("date", col("date").cast("date"))

  private def rolled = TeamMetrics.rolling(history, "team", "date",
    Seq("goals_for"), resultCol = Some("result"),
    sumCols = Seq("goals_for"))
    .select("team", "date", "goals_for", "rolling_goals_for",
      "total_goals_for", "win_ratio", "window_n")
    .orderBy("team", "date", "goals_for")
    .collect()

  test("90-day window is inclusive of both edges (pandas parity)") {
    val r = rolled
    // 2025-04-01 row: includes 01-01 (exactly 90 days before), 01-31, self
    val apr1 = r(2)
    assert(apr1.getLong(6) == 3)
    assert(apr1.getDouble(3) == (1.0 + 3.0 + 2.0) / 3)
  }

  test("duplicate dates are window peers, included in each other's frame") {
    val r = rolled
    // both 04-02 rows see: 01-31, 04-01, and BOTH 04-02 rows (n=4)
    val apr2a = r(3); val apr2b = r(4)
    assert(apr2a.getLong(6) == 4 && apr2b.getLong(6) == 4)
    assert(apr2a.getDouble(3) == (3.0 + 2.0 + 4.0 + 6.0) / 4)
    assert(apr2a.getDouble(3) == apr2b.getDouble(3))
  }

  test("min_periods=1: first row gets itself") {
    val r = rolled
    assert(r(0).getLong(6) == 1 && r(0).getDouble(3) == 1.0)
  }

  test("rolling sum and win ratio over the same frame") {
    val r = rolled
    assert(r(2).getDouble(4) == 6.0)             // total_goals_for @04-01
    assert(r(2).getDouble(5) == (1.0 + 0.5 + 0.0) / 3) // W,D,L
    val b = r(5)
    assert(b.getString(0) == "B" && b.getDouble(5) == 1.0)
  }

  test("partitions are independent per team") {
    val r = rolled
    assert(r(5).getLong(6) == 1) // B unaffected by A's rows
  }

  test("latestPerTeam picks rank-1 under a total order") {
    val latest = TeamMetrics.latestPerTeam(history, "team", "date",
      Seq(col("goals_for")))
      .select("team", "date", "goals_for").orderBy("team").collect()
    assert(latest.length == 2)
    assert(latest(0).getString(0) == "A" &&
      latest(0).getDouble(2) == 6.0) // 04-02 tie broken by goals_for desc
    assert(latest(1).getString(0) == "B")
  }

  test("single window spec per pass: plan contains exactly one Window node") {
    val plan = TeamMetrics.rolling(history, "team", "date",
      Seq("goals_for"), Some("result"), Seq("goals_for"))
      .queryExecution.optimizedPlan.toString
    val windowNodes = "Window \\[".r.findAllIn(plan).length
    assert(windowNodes == 1, s"expected 1 Window node, plan:\n$plan")
  }
}
