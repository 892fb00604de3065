package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** A1–A3: time-windowed rolling team metrics — the Spark-native form of
  * `utils/data_utils.py:238-301` (`aggregate_team_stats`).
  *
  * The reference groups per team, sets a DatetimeIndex and runs pandas
  * `rolling('90D', min_periods=1)` per group, then concatenates the per-
  * group frames back (A4). In Spark all of that is ONE window spec:
  * `partitionBy(team).orderBy(epochSeconds).rangeBetween(-90d, 0)` —
  * a single hash-shuffle on the team key, after which every rolling
  * column is computed in the same sort pass. No per-group collect, no
  * concat, no second shuffle: at 100 TB this is one exchange total.
  *
  * Window-frame parity (SURVEY §7.4): pandas `rolling('90D')` is
  * time-based, inclusive of both edges, duplicate timestamps allowed,
  * min_periods=1. `rangeBetween(-90*86400, 0)` over epoch seconds has
  * identical semantics (RANGE frames include all peers of the current
  * row, matching pandas' duplicate-date behavior).
  */
object TeamMetrics {

  val DefaultWindowDays = 90

  /** Shared rolling frame: one shuffle for every metric column. */
  def rollingWindow(teamCol: String, dateCol: String,
                    windowDays: Int = DefaultWindowDays): WindowSpec =
    Window.partitionBy(teamCol)
      .orderBy(col(dateCol).cast("timestamp").cast("long"))
      .rangeBetween(-windowDays.toLong * 86400L, 0L)

  /** Rolling mean of each stat column (A1), rolling sums of goals (A2),
    * rolling win ratio (A3) — all over the same frame.
    *
    * Means are computed as exact `DECIMAL(18,2)` running sums divided by
    * the running count: order-independent (decimal addition is exact), so
    * results are reproducible bit-for-bit under any partitioning — a
    * requirement for the DuckDB-oracle hash gate and good hygiene at
    * cluster scale where task order is nondeterministic.
    */
  def rolling(df: DataFrame, teamCol: String, dateCol: String,
              statCols: Seq[String], resultCol: Option[String] = None,
              sumCols: Seq[String] = Nil,
              windowDays: Int = DefaultWindowDays): DataFrame = {
    val w = rollingWindow(teamCol, dateCol, windowDays)
    val n = count(lit(1)).over(w)

    def rollingMean(c: Column): Column =
      sum(c.cast("decimal(18,2)")).over(w).cast("double") / n

    val means = statCols.map(s => rollingMean(col(s)).as(s"rolling_$s"))
    val sums = sumCols.map(s =>
      sum(col(s).cast("decimal(18,2)")).over(w).cast("double").as(s"total_$s"))
    val ratio = resultCol.toSeq.map(r =>
      (sum(Normalize.resultPoints(col(r)).cast("decimal(9,1)")).over(w)
        .cast("double") / n).as("win_ratio"))

    df.select((df.columns.toIndexedSeq.map(col) ++ means ++ sums ++ ratio)
      :+ n.as("window_n"): _*)
  }

  /** W1/O5 — latest row per team (rank-1) / per-group top-N: ranking
    * window the reference only implies via sort-desc + head
    * (`scrapers/team_scraper.py:606,767`). `tieBreak` must make the
    * ordering total, or "first" is nondeterministic under parallelism
    * (SURVEY §7.4 keep='first' risk).
    */
  def latestPerTeam(df: DataFrame, teamCol: String, dateCol: String,
                    tieBreak: Seq[Column], n: Int = 1): DataFrame = {
    val order = col(dateCol).desc +: tieBreak.map(_.desc)
    val w = Window.partitionBy(teamCol).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
  }
}
