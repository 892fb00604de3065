package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 — the reference's core query: fixtures double-left-joined against
  * team metrics with `home_`/`away_` column-prefix fan-out
  * (`utils/data_utils.py:122-191`; prefix fan-out `:153-172` = P3).
  *
  * Scale design: the metrics side is one row per team (after the as-of
  * reduction) — a dimension. Both legs are `broadcast()` hash joins: zero
  * shuffle of the (huge) fixtures fact at any scale. The reference
  * instead does two pandas merges on a single thread.
  *
  * Join-multiplicity semantics (SURVEY §7.4): the reference joins on team
  * only, so a fixture matches EVERY (team, date) metrics row — row
  * multiplication. `faithful = true` reproduces that bug-compatibly;
  * the default reduces metrics to the latest row per team first (the
  * corrected as-of form the combined output implies).
  */
object CombineData {

  /** Rename every non-key column of `metrics` to `prefix<col>` (P3). */
  def prefixed(metrics: DataFrame, teamCol: String, prefix: String): DataFrame =
    metrics.select(col(teamCol) +: metrics.columns.toIndexedSeq
      .filter(_ != teamCol).map(c => col(c).as(s"$prefix$c")): _*)

  /** @param fixtures  fact side with `homeKey`/`awayKey` team columns
    * @param metrics   per-team metrics; reduced to latest-per-team unless
    *                  `faithful` (needs `dateCol` + `tieBreak` for a total
    *                  order — deterministic under parallelism)
    * @param scope     tracks the plan-lifetime cache for explicit release
    *                  by the scope's owner (harness default; Pipeline.run
    *                  passes a per-run scope)
    */
  def combine(fixtures: DataFrame, metrics: DataFrame,
              teamCol: String, homeKey: String, awayKey: String,
              dateCol: String, tieBreakCols: Seq[String],
              faithful: Boolean = false,
              scope: graft.CacheScope = graft.CacheScope.harness)
      : DataFrame = {
    // The reduced per-team dim feeds BOTH join legs; the home/away alias
    // projections differ, so Spark cannot reuse the broadcast exchange and
    // would compute the (expensive) upstream metrics twice. Persisting the
    // tiny dim computes it once. (Plan-audited: see Explain j01_combined.)
    // Lifecycle: the cached blocks outlive this call (the returned plan
    // references them lazily), so they register in `scope` and the owner
    // releases them once the joined result is consumed.
    val m =
      if (faithful) metrics
      else scope.track(TeamMetrics.latestPerTeam(metrics, teamCol, dateCol,
        tieBreakCols.map(col)))
    // join keys get unique names so the post-join drop is by-name
    // (dropping by Column reference silently no-ops once the attribute
    // is wrapped in a broadcast subtree)
    val home = prefixed(m, teamCol, "home_").withColumnRenamed(teamCol, "__hk")
    val away = prefixed(m, teamCol, "away_").withColumnRenamed(teamCol, "__ak")
    fixtures
      .join(broadcast(home), fixtures(homeKey) === col("__hk"), "left")
      .drop("__hk")
      .join(broadcast(away), fixtures(awayKey) === col("__ak"), "left")
      .drop("__ak")
  }
}
