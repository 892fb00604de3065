package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.queries.{Charts, Reports}

/** K5 chart sink: the dependency-free SVG renderers must be byte-stable
  * (same aggregate rows → identical bytes on any partitioning — golden
  * hashes pin it), well-formed, and still guarded by the K5 collect cap.
  */
class ChartsSpec extends SparkSpec {
  import spark.implicits._

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val leagues = Seq(("Premier League", 12L), ("La Liga", 9L),
    ("Serie A", 7L), ("Bundesliga", 4L))
  private val dates = Seq(("2025-05-20", 3L), ("2025-05-21", 6L),
    ("2025-05-22", 2L), ("2025-05-23", 5L))
  private val teams = Seq(
    ("Arsenal", 2.1, 0.9, 0.72, 0.55), ("Chelsea", 1.6, 1.2, 0.58, 0.41),
    ("Everton", 1.1, 1.5, 0.35, 0.33))
  private val quality = Seq(("Arsenal", "Chelsea", 0.65),
    ("Arsenal", "Everton", 0.54), ("Chelsea", "Everton", 0.47))

  test("all five reference charts render well-formed, annotated SVG") {
    val bar = Charts.fixturesByLeagueSvg(leagues.toDF("league", "n"))
    assert(bar.startsWith("<svg") && bar.endsWith("</svg>\n"))
    assert(bar.contains("Upcoming Fixtures by League") &&
      bar.contains("Premier League") && bar.contains(">12<"))

    val line = Charts.fixturesTimelineSvg(dates.toDF("date", "n"))
    assert(line.contains("polyline") && line.contains("2025-05-21") &&
      line.contains(">6.0<"))

    val ratios = Charts.winRatioSvg(
      teams.map(t => (t._1, t._4)).toDF("team", "win_ratio"))
    assert(ratios.contains("72.0%") && ratios.contains("Arsenal"))

    val scatter = Charts.goalsScatterSvg(
      teams.toDF("team", "gf", "ga", "wr", "acc"))
    assert(scatter.contains("circle") && scatter.contains("Everton") &&
      scatter.contains("stroke-dasharray")) // the y=x diagonal

    val heat = Charts.qualityHeatmapSvg(
      quality.toDF("home_team", "away_team", "match_quality"))
    assert(heat.contains("0.65") && heat.contains("Match Quality"))
    // XML well-formedness of every renderer's output (the JDK parser is
    // strict — unescaped &/< in a team name would fail here)
    Seq(bar, line, ratios, scatter, heat).foreach { svg =>
      javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
    }
  }

  test("golden: byte-identical across partitionings and runs") {
    def renderAll(parts: Int): Seq[String] = {
      val l = leagues.toDF("league", "n").repartition(parts)
        .orderBy(desc("n"), col("league"))
      val d = dates.toDF("date", "n").repartition(parts).orderBy("date")
      val q = quality.toDF("h", "a", "v").repartition(parts)
        .orderBy("h", "a")
      Seq(Charts.fixturesByLeagueSvg(l), Charts.fixturesTimelineSvg(d),
        Charts.qualityHeatmapSvg(q))
    }
    val one = renderAll(1); val eight = renderAll(8)
    assert(one == eight, "SVG bytes must not depend on partitioning")
    // golden hashes: any rendering change must be a conscious edit here
    assert(one.map(sha) == Seq(
      "7cf5febd448424876c7360898cc6787d57079a681349bcac48398e242b1afd21",
      "5aec8f0a1676509ac8bdadc32f17b557c3aba5e1c300ca1bf923294b3a081818",
      "bedcc06b434ff67375c45cc0875b6c15283b50ba9a068a6027fc3c60f886e895"),
      s"golden SVG hashes moved: ${one.map(sha)}")
  }

  test("escaping: hostile team names cannot break the SVG") {
    val svg = Charts.fixturesByLeagueSvg(
      Seq(("""<script>&"hack"</script>""", 3L)).toDF("league", "n"))
    assert(!svg.contains("<script>"))
    javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
  }

  test("K5 guard: an unaggregated frame cannot flood the driver") {
    val big = spark.range(20001).select(
      concat(lit("L"), col("id")).as("league"), col("id").as("n"))
    val e = intercept[IllegalArgumentException] {
      Charts.fixturesByLeagueSvg(big)
    }
    assert(e.getMessage.contains("aggregate further"))
  }

  test("save writes the bytes verbatim") {
    val dir = java.nio.file.Files.createTempDirectory("graft-charts")
    val svg = Charts.fixturesByLeagueSvg(leagues.toDF("league", "n"))
    val path = s"$dir/fixtures_by_league.svg"
    Charts.save(svg, path)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8") == svg)
  }

  test("renderers compose with the real Reports aggregates") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderpriority").as("league"),
        col("o_orderdate").as("date"))
    val svg = Charts.fixturesByLeagueSvg(
      Reports.countByKey(orders, "league"))
    assert(svg.contains("1-URGENT"))
    val line = Charts.fixturesTimelineSvg(orders.groupBy("date").count()
      .orderBy("date").limit(30))
    assert(line.contains("polyline"))
  }
}
