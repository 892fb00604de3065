package graft

import org.apache.spark.sql.functions._

import graft.functions.Normalize
import Registry._

/** Scalar-function inventory (SURVEY §2.8, X1–X17) exercised over the
  * synthetic tables. Inputs are synthesized from integer keys wherever a
  * dirty string is needed, so both engines see byte-identical inputs and
  * every output is an exact function of them.
  */
object RegistryScalars {

  def entries: Seq[Q] = Seq(

    // ---- X1: normalize_team_name (suffix strip + full alias table) --------
    // Inputs cycle through four mapped aliases (one post-suffix-strip, one
    // accent-adding, plus two plain) and a passthrough name, so the oracle
    // exercises the real `defaultAliases` table, not a toy map.
    Q("x01_normalize_team",
      (s, dir) => {
        val raw = when(col("p_partkey") % 5 === 0, "Wolves FC")
          .when(col("p_partkey") % 5 === 1, "Paris Saint-Germain")
          .when(col("p_partkey") % 5 === 2, "Inter")
          .when(col("p_partkey") % 5 === 3, "Bayern Munich")
          .otherwise(col("p_name"))
        t(s, dir, "part").select(col("p_partkey"), raw.as("raw"),
            Normalize.normalizeTeamName(raw, Normalize.defaultAliases)
              .as("team"))
          .orderBy("p_partkey")
      },
      Some("""WITH r AS (
             |  SELECT p_partkey,
             |    CASE p_partkey % 5
             |      WHEN 0 THEN 'Wolves FC'
             |      WHEN 1 THEN 'Paris Saint-Germain'
             |      WHEN 2 THEN 'Inter'
             |      WHEN 3 THEN 'Bayern Munich'
             |      ELSE p_name END AS raw
             |  FROM part),
             |s AS (
             |  SELECT p_partkey, raw,
             |    regexp_replace(trim(raw), '\s+(FC|CF|AFC)$', '') AS stripped
             |  FROM r)
             |SELECT p_partkey, raw,
             |  CASE stripped
             |    WHEN 'Wolves' THEN 'Wolverhampton Wanderers'
             |    WHEN 'Paris Saint-Germain' THEN 'PSG'
             |    WHEN 'Inter' THEN 'Inter Milan'
             |    WHEN 'Bayern Munich' THEN 'Bayern München'
             |    ELSE stripped END AS team
             |FROM s ORDER BY p_partkey""".stripMargin)),

    // ---- X2: multi-format date parse cascade ------------------------------
    // Raw strings cycle through ALL 12 reference formats
    // (`utils/data_utils.py:53-57`) and the parse uses the DEFAULT cascade,
    // so the oracle proves both the format list and its ORDER (ambiguous
    // day/month strings resolve day-first in both engines because
    // `%d-%m-%Y` precedes `%m-%d-%Y`).
    Q("x02_normalize_date",
      (s, dir) => {
        val d = col("o_orderdate")
        // the 12 reference formats, in cascade order (source of truth;
        // the 13th entry is the inference-fallback stand-in, not a
        // reference format, so it is not used to GENERATE raw strings)
        val fmts = Normalize.defaultDateFormats.dropRight(1)
        val raw = fmts.zipWithIndex.tail.foldLeft(
            when(col("o_orderkey") % 12 === 0, date_format(d, fmts.head))) {
          case (acc, (f, i)) =>
            acc.when(col("o_orderkey") % 12 === i, date_format(d, f))
        }
        tf(s, dir, "orders").select(col("o_orderkey"), raw.as("raw"),
            date_format(Normalize.normalizeDate(raw), "yyyy-MM-dd")
              .as("parsed"))
          .orderBy("o_orderkey")
      },
      Some("""WITH r AS (
             |  SELECT o_orderkey,
             |    CASE o_orderkey % 12
             |      WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
             |      WHEN 1 THEN strftime(o_orderdate, '%Y%m%d')
             |      WHEN 2 THEN strftime(o_orderdate, '%d/%m/%Y')
             |      WHEN 3 THEN strftime(o_orderdate, '%m/%d/%Y')
             |      WHEN 4 THEN strftime(o_orderdate, '%d-%m-%Y')
             |      WHEN 5 THEN strftime(o_orderdate, '%m-%d-%Y')
             |      WHEN 6 THEN strftime(o_orderdate, '%d.%m.%Y')
             |      WHEN 7 THEN strftime(o_orderdate, '%m.%d.%Y')
             |      WHEN 8 THEN strftime(o_orderdate, '%d%m%Y')
             |      WHEN 9 THEN strftime(o_orderdate, '%m%d%Y')
             |      WHEN 10 THEN strftime(o_orderdate, '%b %d, %Y')
             |      ELSE strftime(o_orderdate, '%d %b %Y') END AS raw
             |  FROM orders)
             |SELECT o_orderkey, raw,
             |  strftime(CAST(coalesce(
             |    try_strptime(raw, '%Y-%m-%d'),
             |    try_strptime(raw, '%Y%m%d'),
             |    try_strptime(raw, '%d/%m/%Y'),
             |    try_strptime(raw, '%m/%d/%Y'),
             |    try_strptime(raw, '%d-%m-%Y'),
             |    try_strptime(raw, '%m-%d-%Y'),
             |    try_strptime(raw, '%d.%m.%Y'),
             |    try_strptime(raw, '%m.%d.%Y'),
             |    try_strptime(raw, '%d%m%Y'),
             |    try_strptime(raw, '%m%d%Y'),
             |    try_strptime(raw, '%b %d, %Y'),
             |    try_strptime(raw, '%d %b %Y'),
             |    try_strptime(raw, '%Y/%m/%d')) AS DATE), '%Y-%m-%d')
             |    AS parsed
             |FROM r ORDER BY o_orderkey""".stripMargin)),

    // ---- X3: clean_number --------------------------------------------------
    Q("x03_clean_number",
      (s, dir) => {
        val raw = when(col("o_orderkey") % 5 === 0, "N/A")
          .otherwise(concat(lit("$"), col("o_orderkey").cast("string"),
            lit(".50")))
        t(s, dir, "orders").select(col("o_orderkey"), raw.as("raw"),
            Normalize.cleanNumber(raw).as("cleaned"))
          .orderBy("o_orderkey")
      },
      Some("""WITH r AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 5 = 0 THEN 'N/A'
             |      ELSE '$' || CAST(o_orderkey AS VARCHAR) || '.50' END AS raw
             |  FROM orders)
             |SELECT o_orderkey, raw,
             |  TRY_CAST(nullif(regexp_replace(raw, '[^0-9.\-]', '', 'g'), '')
             |    AS DOUBLE) AS cleaned
             |FROM r ORDER BY o_orderkey""".stripMargin)),

    // ---- X4: generate_match_id ---------------------------------------------
    Q("x04_match_id",
      (s, dir) => t(s, dir, "orders").select(col("o_orderkey"),
          Normalize.matchId(col("o_orderdate").cast("date"),
            concat(lit("Team "), col("o_custkey").cast("string")),
            concat(lit("Team "), ((col("o_custkey") * 13 + 7) % 100)
              .cast("string"))).as("match_id"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  strftime(CAST(o_orderdate AS DATE), '%Y%m%d') || '_' ||
             |  regexp_replace(lower('Team ' || CAST(o_custkey AS VARCHAR)),
             |    '[^a-z0-9]', '', 'g') || '_' ||
             |  regexp_replace(lower('Team ' ||
             |      CAST((o_custkey*13+7)%100 AS VARCHAR)),
             |    '[^a-z0-9]', '', 'g') AS match_id
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- X5/X6: result standardization + numeric map ------------------------
    Q("x05_result_standardize",
      (s, dir) => {
        val raw = when(col("o_orderkey") % 6 === 0, "W")
          .when(col("o_orderkey") % 6 === 1, "Win")
          .when(col("o_orderkey") % 6 === 2, "Draw")
          .when(col("o_orderkey") % 6 === 3, "l")
          .when(col("o_orderkey") % 6 === 4, "0.5")
          .otherwise("garbage")
        t(s, dir, "orders").select(col("o_orderkey"), raw.as("raw"),
            Normalize.standardizeResult(raw).as("result"),
            Normalize.resultPoints(Normalize.standardizeResult(raw))
              .as("points"))
          .orderBy("o_orderkey")
      },
      Some("""WITH r AS (
             |  SELECT o_orderkey, CASE o_orderkey % 6
             |    WHEN 0 THEN 'W' WHEN 1 THEN 'Win' WHEN 2 THEN 'Draw'
             |    WHEN 3 THEN 'l' WHEN 4 THEN '0.5'
             |    ELSE 'garbage' END AS raw
             |  FROM orders),
             |m AS (
             |  SELECT o_orderkey, raw,
             |    CASE WHEN raw IN ('W','Win','win','w','1','1.0') THEN 'W'
             |      WHEN raw IN ('D','Draw','draw','d','0.5') THEN 'D'
             |      WHEN raw IN ('L','Loss','loss','l','0','0.0') THEN 'L'
             |      ELSE 'U' END AS result
             |  FROM r)
             |SELECT o_orderkey, raw, result,
             |  CASE result WHEN 'W' THEN 1.0 WHEN 'D' THEN 0.5
             |    ELSE 0.0 END AS points
             |FROM m ORDER BY o_orderkey""".stripMargin)),

    // ---- X7: shot_accuracy ---------------------------------------------------
    Q("x07_shot_accuracy",
      (s, dir) => t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          Normalize.shotAccuracy(col("l_quantity"),
            col("l_quantity") * col("l_discount")).as("shot_accuracy"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_quantity > 0
             |    THEN (l_quantity * l_discount) / l_quantity
             |    ELSE 0.0 END AS shot_accuracy
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- X8: conversion_rate -------------------------------------------------
    Q("x08_conversion_rate",
      (s, dir) => t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          Normalize.conversionRate(col("l_discount"), col("l_tax"))
            .as("conversion_rate"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_discount > 0 THEN l_tax / l_discount
             |    ELSE 0.0 END AS conversion_rate
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- X9: kickoff-time cleanup ---------------------------------------------
    Q("x09_kickoff_time",
      (s, dir) => {
        val raw = when(col("event_id") % 4 === 0, lit("Unknown"))
          .otherwise(concat(lit("Sun "), date_format(col("ts"), "HH:mm")))
        events(s, dir).select(col("event_id"), raw.as("raw"),
            Normalize.cleanKickoffTime(raw).as("kickoff_time"))
          .orderBy("event_id")
      },
      Some("""WITH r AS (
             |  SELECT event_id, CASE WHEN event_id % 4 = 0 THEN 'Unknown'
             |    ELSE 'Sun ' || strftime(ts, '%H:%M') END AS raw
             |  FROM events)
             |SELECT event_id, raw,
             |  CASE WHEN contains(regexp_extract(trim(raw), '([^ ]+)$', 1), ':')
             |    THEN regexp_extract(trim(raw), '([^ ]+)$', 1) END
             |    AS kickoff_time
             |FROM r ORDER BY event_id""".stripMargin)),

    // ---- X10: score split -------------------------------------------------------
    Q("x10_score_split",
      (s, dir) => {
        val score = concat(col("l_linenumber").cast("string"), lit("-"),
          (col("l_suppkey") % 4).cast("string"))
        val home = col("l_returnflag") === "R"
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
            score.as("score"),
            Normalize.scoreGoalsFor(score, home).as("goals_for"),
            Normalize.scoreGoalsAgainst(score, home).as("goals_against"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH r AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(l_linenumber AS VARCHAR) || '-' ||
             |      CAST(l_suppkey % 4 AS VARCHAR) AS score,
             |    l_returnflag = 'R' AS home
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, score,
             |  CASE WHEN home
             |    THEN TRY_CAST(string_split(score, '-')[1] AS DOUBLE)
             |    ELSE TRY_CAST(string_split(score, '-')[2] AS DOUBLE) END
             |    AS goals_for,
             |  CASE WHEN home
             |    THEN TRY_CAST(string_split(score, '-')[2] AS DOUBLE)
             |    ELSE TRY_CAST(string_split(score, '-')[1] AS DOUBLE) END
             |    AS goals_against
             |FROM r ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- X11: match_quality ------------------------------------------------------
    Q("x11_match_quality",
      (s, dir) => {
        val hw = when(col("o_orderkey") % 3 =!= 0,
          (col("o_orderkey") % 10).cast("double") / 10.0)
        val aw = when(col("o_orderkey") % 7 =!= 0,
          (col("o_orderkey") % 5).cast("double") / 5.0)
        t(s, dir, "orders").select(col("o_orderkey"),
            hw.as("home_win_ratio"), aw.as("away_win_ratio"),
            Normalize.matchQuality(hw, aw).as("match_quality"))
          .orderBy("o_orderkey")
      },
      Some("""WITH r AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 3 <> 0
             |      THEN CAST(o_orderkey % 10 AS DOUBLE) / 10.0 END
             |      AS home_win_ratio,
             |    CASE WHEN o_orderkey % 7 <> 0
             |      THEN CAST(o_orderkey % 5 AS DOUBLE) / 5.0 END
             |      AS away_win_ratio
             |  FROM orders)
             |SELECT o_orderkey, home_win_ratio, away_win_ratio,
             |  (coalesce(home_win_ratio, 0.5) + coalesce(away_win_ratio, 0.5))
             |    / 2 AS match_quality
             |FROM r ORDER BY o_orderkey""".stripMargin)),

    // ---- X12: epoch → HH:mm -------------------------------------------------------
    Q("x12_epoch_hhmm",
      (s, dir) => events(s, dir).select(col("event_id"),
          unix_timestamp(col("ts")).as("epoch_s"),
          Normalize.epochToHHmm(unix_timestamp(col("ts"))).as("hhmm"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
             |  strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)),
             |    '%H:%M') AS hhmm
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- X13: season derivation ---------------------------------------------------
    Q("x13_season",
      (s, dir) => t(s, dir, "orders").select(col("o_orderkey"),
          Normalize.season(col("o_orderdate").cast("date")).as("season"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(CASE WHEN month(CAST(o_orderdate AS DATE)) >= 8
             |    THEN year(CAST(o_orderdate AS DATE))
             |    ELSE year(CAST(o_orderdate AS DATE)) - 1 END AS VARCHAR)
             |  || '-' ||
             |  CAST(CASE WHEN month(CAST(o_orderdate AS DATE)) >= 8
             |    THEN year(CAST(o_orderdate AS DATE)) + 1
             |    ELSE year(CAST(o_orderdate AS DATE)) END AS VARCHAR)
             |    AS season
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- X15: is_home + team/opponent swap -----------------------------------------
    Q("x15_is_home",
      (s, dir) => {
        val venue = when(col("l_returnflag") === "R", "Home").otherwise("Away")
        val team = concat(lit("t"), col("l_suppkey").cast("string"))
        val opp = concat(lit("o"), col("l_partkey").cast("string"))
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
            venue.as("venue"), Normalize.isHome(venue).as("is_home"),
            Normalize.homeTeam(venue, team, opp).as("home_team"),
            Normalize.awayTeam(venue, team, opp).as("away_team"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH r AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CASE WHEN l_returnflag='R' THEN 'Home' ELSE 'Away' END
             |      AS venue,
             |    't' || CAST(l_suppkey AS VARCHAR) AS team,
             |    'o' || CAST(l_partkey AS VARCHAR) AS opp
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, venue,
             |  CAST(venue='Home' AS INT) AS is_home,
             |  CASE WHEN venue='Home' THEN team ELSE opp END AS home_team,
             |  CASE WHEN venue='Home' THEN opp ELSE team END AS away_team
             |FROM r ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- X16: percent strip ---------------------------------------------------------
    Q("x16_percent_strip",
      (s, dir) => {
        val raw = concat((col("l_suppkey") % 100).cast("string"), lit("%"))
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
            raw.as("raw"), Normalize.stripPercent(raw).as("value"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH r AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(l_suppkey % 100 AS VARCHAR) || '%' AS raw
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, raw,
             |  TRY_CAST(nullif(replace(raw, '%', ''), '') AS DOUBLE) AS value
             |FROM r ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- X17: JSON multi-path extraction --------------------------------------------
    Q("x17_json_multipath",
      (s, dir) => {
        val parsed = from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, kk BIGINT"))
        events(s, dir).select(col("event_id"),
            coalesce(parsed.getField("kk"), parsed.getField("k")).as("k"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  coalesce(CAST(json_extract_string(props, '$.kk') AS BIGINT),
             |    CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k
             |FROM events ORDER BY event_id""".stripMargin))
  )
}
