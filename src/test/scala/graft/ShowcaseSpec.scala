package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.WinRatioAgg
import graft.streaming.TeamFormState
import graft.streaming.TeamFormState.{MatchResult, TeamForm}

/** §2.10/§2.9 showcases: typed Aggregator UDAF and stateful streaming
  * rolling form (flatMapGroupsWithState), with batch parity.
  */
class ShowcaseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")

  private val matches = Seq(
    MatchResult("A", "m1", ts("2025-05-01"), "W", 2.0),
    MatchResult("A", "m2", ts("2025-05-08"), "D", 1.0),
    MatchResult("A", "m3", ts("2025-05-15"), "L", 0.0),
    MatchResult("B", "m4", ts("2025-05-02"), "W", 3.0))

  test("WinRatioAgg: exact integer buffer, partition-order independent") {
    val df = matches.toDF()
    val r = df.groupBy($"team")
      .agg(WinRatioAgg.column($"result").as("win_ratio"))
      .orderBy("team").collect()
    assert(r(0).getDouble(1) == 0.5)   // W,D,L
    assert(r(1).getDouble(1) == 1.0)   // W
    // same result when the input arrives in any partitioning
    val r12 = df.repartition(12).groupBy($"team")
      .agg(WinRatioAgg.column($"result").as("wr")).orderBy("team").collect()
    assert(r12.map(_.getDouble(1)).toSeq == r.map(_.getDouble(1)).toSeq)
  }

  test("stateful rolling form (batch execution) matches window semantics") {
    val ds = matches.toDS()
    val form = TeamFormState.rollingForm(ds, lookback = 2)
      .collect().map(f => f.matchId -> f).toMap
    assert(form("m1").winRatio == 1.0 && form("m1").matches == 1)
    assert(form("m2").winRatio == 0.75)             // W,D
    assert(form("m3").winRatio == 0.25)             // D,L (W rolled out)
    assert(form("m3").avgGoalsFor == 0.5)
    // batch-window equivalent: rowsBetween(-(N-1), 0)
    val w = Window.partitionBy("team").orderBy("ts")
      .rowsBetween(-1, Window.currentRow)
    val batch = matches.toDF()
      .withColumn("wr", avg(when($"result" === "W", 1.0)
        .when($"result" === "D", 0.5).otherwise(0.0)).over(w))
      .collect().map(r => r.getAs[String]("matchId") ->
        r.getAs[Double]("wr")).toMap
    assert(batch("m3") == form("m3").winRatio)
  }

  test("stateful rolling form runs as a real stream with state across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[MatchResult]
    val q = TeamFormState.rollingForm(input.toDS(), lookback = 2)
      .writeStream.format("memory").queryName("form")
      .outputMode("append").start()
    val out = try {
      input.addData(matches.take(2): _*) // batch 1: m1, m2
      q.processAllAvailable()
      input.addData(matches(2))          // batch 2: m3 — state must persist
      q.processAllAvailable()
      spark.sql("SELECT * FROM form").as[TeamForm].collect()
        .map(f => f.matchId -> f.winRatio).toMap
    } finally q.stop()
    assert(out == Map("m1" -> 1.0, "m2" -> 0.75, "m3" -> 0.25))
  }
}
