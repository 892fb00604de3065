package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.TeamFormState
import graft.streaming.TeamFormState.{MatchResult, TeamForm}

/** Time-windowed stateful rolling form: parity with the batch
  * `rangeBetween` frame (the A1–A3 semantics) and state eviction.
  */
class TimeWindowStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")

  test("time-windowed state matches the batch rangeBetween frame") {
    val rnd = new scala.util.Random(7L)
    // unique (team, ts) pairs: state processes rows one at a time, so
    // range-peer semantics are only comparable without timestamp ties
    val matches = (0 until 200).map { i =>
      MatchResult(s"t${i % 5}", f"m$i%03d",
        ts(f"2025-${1 + (i / 40) % 6}%02d-${1 + (i * 7) % 28}%02d"),
        Seq("W", "D", "L")(rnd.nextInt(3)), rnd.nextInt(5).toDouble)
    }.groupBy(m => (m.team, m.ts)).map(_._2.head).toSeq

    val stateful = TeamFormState.rollingFormByDays(matches.toDS(), 90)
      .collect().map(f => f.matchId -> (f.matches, f.winRatio)).toMap

    val w = Window.partitionBy("team")
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-90L * 86400L, 0L)
    val batch = matches.toDF()
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("wr", (sum(when(col("result") === "W", 2L)
        .when(col("result") === "D", 1L).otherwise(0L)).over(w)
        .cast("double") / 2.0 / col("n")))
      .collect().map(r => r.getAs[String]("matchId") ->
        (r.getAs[Long]("n").toInt, r.getAs[Double]("wr"))).toMap

    assert(stateful.keySet == batch.keySet)
    stateful.foreach { case (id, v) =>
      assert(v == batch(id), s"mismatch at $id: state=$v batch=${batch(id)}")
    }
  }

  test("state is evicted beyond the window (bounded per-team state)") {
    val m = Seq(
      MatchResult("A", "m1", ts("2025-01-01"), "W", 1.0),
      MatchResult("A", "m2", ts("2025-06-01"), "L", 0.0)) // >90d later
    val out = TeamFormState.rollingFormByDays(m.toDS(), 90)
      .collect().map(f => f.matchId -> f.matches).toMap
    assert(out("m2") == 1) // m1 evicted
  }

  test("runs as a stream with eviction across micro-batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[MatchResult]
    val q = TeamFormState.rollingFormByDays(input.toDS(), 90)
      .writeStream.format("memory").queryName("dform")
      .outputMode("append").start()
    val out = try {
      input.addData(MatchResult("A", "m1", ts("2025-01-01"), "W", 1.0))
      q.processAllAvailable()
      input.addData(MatchResult("A", "m2", ts("2025-02-01"), "D", 1.0),
        MatchResult("A", "m3", ts("2025-06-01"), "L", 0.0))
      q.processAllAvailable()
      spark.sql("SELECT * FROM dform").as[TeamForm].collect()
        .map(f => f.matchId -> (f.matches, f.winRatio)).toMap
    } finally q.stop()
    assert(out("m1") == ((1, 1.0)))
    assert(out("m2") == ((2, 0.75)))   // m1 still in 90d window
    assert(out("m3") == ((1, 0.0)))    // both evicted
  }
}
