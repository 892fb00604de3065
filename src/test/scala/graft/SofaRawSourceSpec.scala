package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{Ingest, SofaRawSource}

/** DataSource V2 capture reader: preamble stripping, one partition per
  * file, end-to-end replay into typed event rows (S1/S2).
  */
class SofaRawSourceSpec extends SparkSpec {

  private def capture(events: String): String =
    s"""HTTP/1.1 200 OK
       |Content-Type: application/json
       |X-RateLimit: 100
       |
       |{"events": [$events]}""".stripMargin

  private val event1 =
    """{"id": 1, "homeTeam": {"name": "Arsenal"},
      |"awayTeam": {"name": "Chelsea"},
      |"tournament": {"name": "Premier League",
      |  "category": {"name": "England"}},
      |"startTimestamp": 1747994400,
      |"status": {"description": "Not started"}}""".stripMargin
  private val event2 =
    """{"id": 2, "homeTeam": {"name": "Lyon"},
      |"awayTeam": {"name": "Lille"},
      |"tournament": {"name": "Ligue 1", "category": {"name": "France"}},
      |"startTimestamp": 1748000000,
      |"status": {"description": "Not started"}}""".stripMargin

  test("stripPreamble finds the JSON body after HTTP headers") {
    assert(SofaRawSource.stripPreamble("HTTP/1.1 200 OK\nA: b\n\n{\"x\":1}")
      == "{\"x\":1}")
    assert(SofaRawSource.stripPreamble("no json here") == null)
  }

  test("reads one row per capture file with the preamble stripped") {
    val dir = Files.createTempDirectory("sofa-raw").toString
    Files.writeString(Paths.get(s"$dir/api_response_2025-05-23.txt"),
      capture(event1))
    Files.writeString(Paths.get(s"$dir/api_response_2025-05-24.txt"),
      capture(event2))
    val df = spark.read.format("graft.sources.SofaRawSource").load(dir)
    assert(df.count() == 2)
    assert(df.rdd.getNumPartitions == 2) // one partition per file
    val bodies = df.orderBy("source_file").collect()
    assert(bodies(0).getAs[String]("body").startsWith("{\"events\""))
  }

  test("end-to-end replay: captures -> typed event rows (S1)") {
    val dir = Files.createTempDirectory("sofa-raw2").toString
    Files.writeString(Paths.get(s"$dir/api_response.txt"),
      capture(s"$event1, $event2"))
    val events = Ingest.readSofaCaptures(spark, dir)
      .select(col("event.id").as("id"),
        col("event.homeTeam.name").as("home"),
        col("event.tournament.name").as("league"))
      .orderBy("id").collect()
    assert(events.length == 2)
    assert(events(0).getAs[String]("home") == "Arsenal")
    assert(events(1).getAs[String]("league") == "Ligue 1")
  }
}
