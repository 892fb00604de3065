package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Normalize

/** X1–X17 scalar semantics (`utils/data_utils.py:14-119`,
  * `processors/data_processor.py:70-95,182-219`), unit + property tests.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-ScalaCheck property runner (no scalatestplus bridge in the
    * offline cache).
    */
  private def checkProp(p: Prop, n: Int = 40): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def eval1(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(Option(input)).toDF("v").select(c.as("r")).collect()(0).get(0)

  private def evalOn(rows: Seq[String],
                     c: org.apache.spark.sql.Column): Seq[Any] =
    rows.map(r => eval1(c, r))

  test("X1 normalize_team_name strips club suffixes and applies aliases") {
    val c = Normalize.normalizeTeamName(col("v"),
      Map("Man United" -> "Manchester United"))
    assert(eval1(c, "Arsenal FC") == "Arsenal")
    assert(eval1(c, "  Valencia CF ") == "Valencia")
    assert(eval1(c, "Sunderland AFC") == "Sunderland")
    assert(eval1(c, "Man United") == "Manchester United")
    assert(eval1(c, "FC Porto") == "FC Porto") // prefix untouched
  }

  test("X1 default alias table carries the full reference mapping") {
    val c = Normalize.normalizeTeamName(col("v"), Normalize.defaultAliases)
    assert(Normalize.defaultAliases.size == 26)
    assert(eval1(c, "Wolves") == "Wolverhampton Wanderers")
    assert(eval1(c, "Manchester United") == "Man United")
    assert(eval1(c, "Bayern Munich") == "Bayern München")
    assert(eval1(c, "Paris Saint-Germain") == "PSG")
    assert(eval1(c, "Inter FC") == "Inter Milan") // strip, then alias
  }

  test("X2 normalize_date parses the format cascade, null on garbage") {
    val c = Normalize.normalizeDate(col("v"))
    assert(eval1(c, "2025-05-23").toString == "2025-05-23")
    assert(eval1(c, "20250523").toString == "2025-05-23")
    assert(eval1(c, "23/05/2025").toString == "2025-05-23")
    assert(eval1(c, "05/23/2025").toString == "2025-05-23")
    assert(eval1(c, "23.05.2025").toString == "2025-05-23")
    assert(eval1(c, "05.23.2025").toString == "2025-05-23")
    assert(eval1(c, "23012025").toString == "2025-01-23")
    assert(eval1(c, "01232025").toString == "2025-01-23")
    assert(eval1(c, "Jan 23, 2025").toString == "2025-01-23")
    assert(eval1(c, "23 Jan 2025").toString == "2025-01-23")
    assert(eval1(c, "2025/05/23").toString == "2025-05-23")
    // Cascade ORDER is semantics: ambiguous day/month resolves day-first
    // (%d-%m-%Y precedes %m-%d-%Y), exactly like the reference cascade.
    assert(eval1(c, "03-05-2025").toString == "2025-05-03")
    assert(eval1(c, "not a date") == null)
  }

  test("X3 clean_number strips currency/percent junk; null on empty") {
    val c = Normalize.cleanNumber(col("v"))
    assert(eval1(c, "$1,234.50") == 1234.5)
    assert(eval1(c, "55%") == 55.0)
    assert(eval1(c, "-3.5 xg") == -3.5)
    assert(eval1(c, "N/A") == null)
  }

  test("X4 match_id is yyyyMMdd_home_away, lowercased alnum only") {
    val df = Seq(("2025-05-23", "Man United!", "St. Étienne"))
      .toDF("d", "h", "a")
    val r = df.select(Normalize.matchId(col("d").cast("date"), col("h"),
      col("a"))).collect()(0).getString(0)
    assert(r == "20250523_manunited_sttienne")
  }

  test("X4 property: match_id contains only [a-z0-9_]") {
    checkProp(Prop.forAll(Gen.alphaNumStr, Gen.asciiPrintableStr) {
      (h: String, a: String) =>
        val df = Seq(("2025-01-02", h, a)).toDF("d", "h", "a")
        val r = df.select(Normalize.matchId(col("d").cast("date"), col("h"),
          col("a"))).collect()(0).getString(0)
        r.matches("[a-z0-9_]*") && r.startsWith("20250102_")
    }, n = 15)
  }

  test("X5/X6 result standardization and points") {
    val std = Normalize.standardizeResult(col("v"))
    assert(evalOn(Seq("W", "Win", "w", "1", "Draw", "0.5", "loss", "0", "?!"),
      std) == Seq("W", "W", "W", "W", "D", "D", "L", "L", "U"))
    val pts = Normalize.resultPoints(Normalize.standardizeResult(col("v")))
    assert(evalOn(Seq("Win", "Draw", "Loss", "garbage"), pts) ==
      Seq(1.0, 0.5, 0.0, 0.0))
  }

  test("X7/X8 ratios guard division by zero") {
    val df = Seq((10.0, 4.0), (0.0, 0.0)).toDF("shots", "sot")
    val r = df.select(
      Normalize.shotAccuracy(col("shots"), col("sot")),
      Normalize.conversionRate(col("sot"), lit(2.0))).collect()
    assert(r(0).getDouble(0) == 0.4)
    assert(r(0).getDouble(1) == 0.5)
    assert(r(1).getDouble(0) == 0.0)
    assert(r(1).getDouble(1) == 0.0)
  }

  test("X9 kickoff cleanup takes last token, requires colon") {
    val c = Normalize.cleanKickoffTime(col("v"))
    assert(eval1(c, "Sun 14:30") == "14:30")
    assert(eval1(c, "14:30") == "14:30")
    assert(eval1(c, "Unknown") == null)
  }

  test("X10 score split swaps for away venue") {
    val df = Seq(("2-1", true), ("2-1", false)).toDF("s", "home")
    val r = df.select(
      Normalize.scoreGoalsFor(col("s"), col("home")),
      Normalize.scoreGoalsAgainst(col("s"), col("home"))).collect()
    assert((r(0).getDouble(0), r(0).getDouble(1)) == (2.0, 1.0))
    assert((r(1).getDouble(0), r(1).getDouble(1)) == (1.0, 2.0))
  }

  test("X11 match_quality defaults missing ratios to 0.5") {
    val df = Seq((Some(0.8), None: Option[Double])).toDF("h", "a")
    val r = df.select(Normalize.matchQuality(col("h"), col("a"))).collect()
    assert(r(0).getDouble(0) == 0.65)
  }

  test("X12 epoch formats HH:mm in UTC") {
    val df = Seq(1747994400L).toDF("ts") // 2025-05-23 10:00:00 UTC
    assert(df.select(Normalize.epochToHHmm(col("ts"))).collect()(0)
      .getString(0) == "10:00")
  }

  test("X13 season splits at August") {
    val df = Seq("2025-08-01", "2025-07-31").toDF("d")
    val r = df.select(Normalize.season(col("d").cast("date"))).collect()
    assert(r(0).getString(0) == "2025-2026")
    assert(r(1).getString(0) == "2024-2025")
  }

  test("X15 is_home + team/opponent swap") {
    val df = Seq(("Home", "A", "B"), ("Away", "A", "B"))
      .toDF("v", "t", "o")
    val r = df.select(Normalize.isHome(col("v")),
      Normalize.homeTeam(col("v"), col("t"), col("o")),
      Normalize.awayTeam(col("v"), col("t"), col("o"))).collect()
    assert((r(0).getInt(0), r(0).getString(1), r(0).getString(2)) == (1, "A", "B"))
    assert((r(1).getInt(0), r(1).getString(1), r(1).getString(2)) == (0, "B", "A"))
  }

  test("X16 percent strip") {
    assert(eval1(Normalize.stripPercent(col("v")), "55%") == 55.0)
    assert(eval1(Normalize.stripPercent(col("v")), "") == null)
  }

  test("X2 property: every cascade format round-trips when day > 12") {
    // For day-of-month > 12 no month-first/day-first confusion is
    // possible (a 2-digit field >= 13 can't be a month), so parse∘format
    // must be EXACT for all 12 reference formats. Day <= 12 ambiguity
    // resolving day-first is pinned by the unit test above.
    val patterns = Seq(
      "yyyy-MM-dd", "yyyyMMdd", "dd/MM/yyyy", "MM/dd/yyyy",
      "dd-MM-yyyy", "MM-dd-yyyy", "dd.MM.yyyy", "MM.dd.yyyy",
      "ddMMyyyy", "MMddyyyy", "MMM dd, yyyy", "dd MMM yyyy")
    val gen = for {
      y <- Gen.chooseNum(1900, 2099)
      m <- Gen.chooseNum(1, 12)
      d <- Gen.chooseNum(13, 28)
      f <- Gen.chooseNum(0, patterns.length - 1)
    } yield (java.time.LocalDate.of(y, m, d), patterns(f))
    checkProp(Prop.forAll(gen) { case (date, pat) =>
      val raw = date.format(java.time.format.DateTimeFormatter
        .ofPattern(pat, java.util.Locale.US))
      eval1(date_format(Normalize.normalizeDate(col("v")), "yyyy-MM-dd"),
        raw) == date.toString
    }, n = 24)
  }

  test("X3 property: clean_number parses formatted doubles") {
    checkProp(Prop.forAll(Gen.chooseNum(-1e12, 1e12)) { (d: Double) =>
      val r = eval1(Normalize.cleanNumber(col("v")),
        String.format(java.util.Locale.ROOT, "%.4f", Double.box(d)))
      math.abs(r.asInstanceOf[Double] - d) < 1e-3
    }, n = 15)
  }
}
