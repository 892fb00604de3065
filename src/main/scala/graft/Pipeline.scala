package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{CombineData, Process, TeamMetrics}
import graft.functions.Normalize

/** End-to-end pipeline driver — the Spark-native form of `pipeline.py`
  * (`run()`, `pipeline.py:49-141`) minus the out-of-engine web scraping
  * (stages 1/3 become file reads of previously-captured feeds).
  *
  * One lazy DAG per stage with parquet/CSV checkpoints only at stage
  * boundaries (the reference materializes CSV after every step on one
  * thread). "today" is an explicit parameter, not `datetime.today()`
  * (SURVEY §7.4 determinism).
  */
object Pipeline {

  case class Config(
      fixturesPath: String,
      historyPath: String,
      outDir: String,
      today: String,
      windowDays: Int = 90,
      lookbackMatches: Int = 7,
      aliases: Map[String, String] = Normalize.defaultAliases,
      // webhook notification target (`pipeline.py:123-139` parity);
      // callers wire sys.env.get("SLACK_WEBHOOK_URL") through for the
      // reference's env contract
      webhookUrl: Option[String] = None)

  case class Stats(
      fixturesCount: Long,
      teamsCount: Long,
      joinedRecords: Long,
      leaguesCovered: Long,
      dataCompletion: Double,
      startDate: String,
      endDate: String,
      lookbackMatches: Int)

  /** K1 — CSV sink with header, overwrite, ISO string dates
    * (`processors/data_processor.py:119-120` et al).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S7 — CSV scan with declared schema (no inference job). */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Full pipeline + the reference's webhook notifications: success
    * message after the stats land, error message if any stage throws
    * (`pipeline.py:123-139`). Both sends are driver-side, after all
    * Spark actions, and can never fail the run.
    *
    * Cache discipline: helpers like `CombineData.combine` persist
    * plan-lifetime blocks under the tracked [[CacheScope]] contract. This
    * entry point owns a PRIVATE scope per run — every stage's sink has
    * consumed its plan by the time stats return, so `run` releases
    * exactly the caches this run's stages registered: never pre-existing
    * user caches, and never caches created CONCURRENTLY by other jobs
    * sharing the SparkSession (which both a blunt `clearCache()` and a
    * before/after `getPersistentRDDs` diff would also drop). A full run
    * leaves the session's cache state untouched — spec-pinned in
    * `SinksSpec`.
    */
  def run(spark: SparkSession, cfg: Config): Stats = {
    val scope = new CacheScope
    try {
      val stats = runStages(spark, cfg, scope)
      cfg.webhookUrl.foreach(u =>
        Notify.send(Notify.successMessage(stats), u))
      stats
    } catch {
      case scala.util.control.NonFatal(e) =>
        cfg.webhookUrl.foreach(u => Notify.send(Notify.errorMessage(e), u))
        throw e
    } finally {
      scope.release()
    }
  }

  private def runStages(spark: SparkSession, cfg: Config,
                        scope: CacheScope): Stats = {
    val today = lit(cfg.today).cast("date")

    // Stage 2 — process fixtures (extract stage 1 is the captured file).
    val rawFixtures = readCsv(spark, cfg.fixturesPath, graft.model.Tables.matches)
      .withColumn("match_id", lit(null).cast("string"))
      .withColumn("kickoff_time", col("start_time"))
    val fixtures = Process.processFixtures(rawFixtures, today, cfg.aliases)
    writeCsv(isoDates(fixtures), s"${cfg.outDir}/fixtures")

    // F7 — non-empty guard (`processors/data_processor.py:43-46` et al):
    // nothing upcoming → emit empty stats, skip the downstream stages.
    if (fixtures.isEmpty) {
      val empty = Stats(0, 0, 0, 0, 0.0, "", "", cfg.lookbackMatches)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(cfg.outDir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"${cfg.outDir}/pipeline_stats.json"),
        s"{\"fixtures_count\":0,\"teams_count\":0,\"joined_records\":0}")
      return empty
    }

    // Stage 4 — process team history.
    val rawHistory = readCsv(spark, cfg.historyPath, graft.model.Tables.teamHistory)
    val history = Process.processHistory(rawHistory, today, cfg.aliases)
    writeCsv(isoDates(history), s"${cfg.outDir}/history")

    // Stage 5a — rolling team metrics (A1–A3; one window pass).
    val statCols = Seq("goals_for", "goals_against", "shots",
      "shots_on_target", "xg", "possession")
    val metrics = TeamMetrics.rolling(history, "team", "date",
      statCols, resultCol = Some("result"),
      sumCols = Seq("goals_for", "goals_against"),
      windowDays = cfg.windowDays)

    // Stage 5b — combined output (J1 + P3), corrected as-of form.
    val metricCols = Seq("team", "date") ++
      statCols.map(c => s"rolling_$c") ++
      Seq("total_goals_for", "total_goals_against", "win_ratio")
    val combined = CombineData.combine(
      fixtures, metrics.select(metricCols.map(col): _*),
      "team", "home_team", "away_team", "date", Nil, scope = scope)
      .withColumn("match_quality",
        Normalize.matchQuality(col("home_win_ratio"), col("away_win_ratio")))
      .orderBy("date", "match_id")                          // O3
    writeCsv(isoDates(combined), s"${cfg.outDir}/football_data")

    // pipeline_stats parity (`pipeline.py:103-118`) — one aggregation
    // pass per input, scalars collected driver-side (A8/A9/A12).
    val teams = fixtures.select(col("home_team").as("team"))
      .unionByName(fixtures.select(col("away_team").as("team")))
      .distinct()                                           // J2/U2
    val fixtureCols = Seq("match_id", "date", "home_team", "away_team",
      "league", "kickoff_time")
    val fxAggs = Seq(
      count(lit(1)).as("n"),
      countDistinct(col("league")).as("leagues"),
      min(col("date")).cast("string").as("start_date"),
      max(col("date")).cast("string").as("end_date")) ++
      fixtureCols.map(c =>
        sum(col(c).isNotNull.cast("long")).as(s"nn_$c"))
    val fxAgg = fixtures.agg(fxAggs.head, fxAggs.tail: _*)
    val fx = fxAgg.collect()(0)
    val joined = combined.count()
    val nFix = fx.getAs[Long]("n")
    val completion =
      if (nFix == 0) 0.0
      else fixtureCols.map(c => fx.getAs[Long](s"nn_$c").toDouble / nFix)
        .sum / fixtureCols.size

    val stats = Stats(
      fixturesCount = nFix,
      teamsCount = teams.count(),
      joinedRecords = joined,
      leaguesCovered = fx.getAs[Long]("leagues"),
      dataCompletion = completion,
      startDate = Option(fx.getAs[String]("start_date")).getOrElse(""),
      endDate = Option(fx.getAs[String]("end_date")).getOrElse(""),
      lookbackMatches = cfg.lookbackMatches)

    // K4 — stats JSON sink.
    val statsJson =
      s"""{"fixtures_count":${stats.fixturesCount},"teams_count":${stats.teamsCount},
         |"joined_records":${stats.joinedRecords},"leagues_covered":${stats.leaguesCovered},
         |"data_completion":"${(stats.dataCompletion * 100).round}%",
         |"start_date":"${stats.startDate}","end_date":"${stats.endDate}",
         |"lookback_matches":${stats.lookbackMatches}}""".stripMargin
      .replace("\n", "")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cfg.outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${cfg.outDir}/pipeline_stats.json"), statsJson)
    stats
  }

  /** Date columns → ISO strings at sinks (golden parity with the
    * reference's string dates, SURVEY §7.4).
    */
  private def isoDates(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType ==
        org.apache.spark.sql.types.DateType)
      .foldLeft(df)((d, f) =>
        d.withColumn(f.name, date_format(col(f.name), "yyyy-MM-dd")))
}
