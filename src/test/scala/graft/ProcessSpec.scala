package graft

import org.apache.spark.sql.functions._

import graft.etl.Process

/** Cleaning/validation stages (`processors/data_processor.py:34-269`,
  * `utils/data_utils.py:194-235`).
  */
class ProcessSpec extends SparkSpec {
  import spark.implicits._

  test("processFixtures: normalize, dedup keep-first, future filter, sort") {
    val raw = Seq(
      // match_id, date, home, away, kickoff
      (null, "2025-06-02", "Arsenal FC", "Spurs", "Sun 15:00"),
      (null, "2025-06-01", "Man United", "Chelsea FC", "12:30"),
      (null, "2025-06-01", "Man Utd", "Chelsea", "12:30"),  // dup after norm
      (null, "2020-01-01", "Old Match", "Gone", "10:00")    // past → dropped
    ).toDF("match_id", "date", "home_team", "away_team", "kickoff_time")
    // Explicit alias map: this test exercises normalize+dedup machinery,
    // not the default table (which maps neither "Man Utd" nor "Spurs").
    val out = Process.processFixtures(raw, lit("2025-05-23").cast("date"),
      aliases = Map("Man United" -> "Manchester United",
        "Man Utd" -> "Manchester United",
        "Spurs" -> "Tottenham Hotspur"))
    val rows = out.collect()
    assert(rows.length == 2)
    // sorted by (date, kickoff): Man United match first
    assert(rows(0).getAs[String]("home_team") == "Manchester United")
    assert(rows(0).getAs[String]("away_team") == "Chelsea")
    assert(rows(0).getAs[String]("match_id") ==
      "20250601_manchesterunited_chelsea")
    assert(rows(1).getAs[String]("home_team") == "Arsenal")
    assert(rows(1).getAs[String]("kickoff_time") == "15:00")
  }

  test("processHistory: result map, derived ratios, past filter, sort") {
    val raw = Seq(
      ("Arsenal FC", "2025-05-01", "Home", "Spurs", "Win", 2.0, 1.0, 10.0, 4.0, null.asInstanceOf[String]),
      ("Arsenal FC", "2025-05-10", "Away", "Chelsea", "0", 0.0, 1.0, 0.0, 0.0, null.asInstanceOf[String]),
      ("Arsenal FC", "2025-06-10", "Home", "Future", "W", 1.0, 0.0, 5.0, 2.0, null.asInstanceOf[String])
    ).toDF("team", "date", "venue", "opponent", "result",
      "goals_for", "goals_against", "shots", "shots_on_target", "match_id")
      .withColumn("date", col("date").cast("date"))
    val out = Process.processHistory(raw, lit("2025-05-23").cast("date"),
      aliases = Map("Spurs" -> "Tottenham Hotspur"))
    val rows = out.collect()
    assert(rows.length == 2)
    // sorted team asc, date desc → 05-10 first
    assert(rows(0).getAs[String]("result") == "L")
    assert(rows(0).getAs[Double]("shot_accuracy") == 0.0)
    assert(rows(1).getAs[String]("result") == "W")
    assert(rows(1).getAs[Double]("shot_accuracy") == 0.4)
    assert(rows(1).getAs[Double]("conversion_rate") == 0.5)
    assert(rows(1).getAs[String]("match_id") ==
      "20250501_arsenal_tottenhamhotspur")
  }

  test("dedupFirst is deterministic under an explicit order") {
    val df = Seq(("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b"))
      .toDF("key", "ord", "val")
    val out = Process.dedupFirst(df, Seq("key"), Seq(col("ord"))).collect()
    assert(out.length == 1 && out(0).getAs[String]("val") == "a")
  }

  test("validate reports totals, duplicate keys, per-column nulls") {
    val df = Seq(
      ("m1", Some("A")), ("m1", Some("B")), ("m2", None)
    ).toDF("match_id", "team")
    val r = Process.validate(df, "match_id", Seq("team")).collect()(0)
    assert(r.getAs[Long]("total_rows") == 3)
    assert(r.getAs[Long]("duplicate_keys") == 1)
    assert(r.getAs[Long]("nulls_team") == 1)
  }

  test("completion: mean of per-column non-null fractions") {
    val df = Seq((Some("a"), Some("x")), (None, Some("y")),
      (None, None): (Option[String], Option[String]))
      .toDF("c1", "c2")
    val r = Process.completion(df, Seq("c1", "c2")).collect()(0)
    assert(math.abs(r.getAs[Double]("data_completion") - 0.5) < 1e-12)
  }
}
