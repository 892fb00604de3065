package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.9 streaming-state showcase: per-team rolling form over the last N
  * matches, maintained incrementally with `flatMapGroupsWithState` — the
  * streaming-native version of the batch rolling metrics (A1–A3/O5).
  *
  * State per team is a bounded ring of the last N results — O(teams · N)
  * total, independent of stream length. In batch the same numbers come
  * from a `rowsBetween(-(N-1), 0)` window; the test asserts parity.
  */
object TeamFormState {

  case class MatchResult(team: String, matchId: String, ts: java.sql.Timestamp,
                         result: String, goalsFor: Double)
  case class TeamForm(team: String, matchId: String, matches: Int,
                      winRatio: Double, avgGoalsFor: Double)
  case class FormBuf(entries: List[(Long, String, String, Double)])

  val DefaultLookback = 7

  def points(result: String): Double = result match {
    case "W" => 1.0
    case "D" => 0.5
    case _   => 0.0
  }

  /** Pure update function — unit-testable without a stream. Emits one
    * TeamForm row per incoming match, computed over the last N results
    * (including the new one), matching per-group top-N recency (O5).
    */
  def updateTeam(lookback: Int)(
      team: String, rows: Iterator[MatchResult],
      state: GroupState[FormBuf]): Iterator[TeamForm] = {
    var buf = state.getOption.getOrElse(FormBuf(Nil)).entries
    val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.matchId)).map { r =>
      // keep the N LARGEST (ts, matchId) entries — exactly the frame a
      // ROWS BETWEEN N-1 PRECEDING window ordered by (ts, matchId) sees
      buf = ((r.ts.getTime, r.matchId, r.result, r.goalsFor) :: buf)
        .sortBy(e => (e._1, e._2))(
          Ordering.Tuple2(Ordering.Long, Ordering.String).reverse)
        .take(lookback)
      val n = buf.size
      // exact integer half-points, same arithmetic as the batch path
      val halfPts = buf.map(e => (points(e._3) * 2).toLong).sum
      val goals = buf.map(_._4).sum
      TeamForm(team, r.matchId, n, halfPts.toDouble / 2.0 / n, goals / n)
    }
    state.update(FormBuf(buf))
    out.iterator
  }

  /** Wire the stateful operator over a (streaming or batch) Dataset. */
  def rollingForm(ds: Dataset[MatchResult], lookback: Int = DefaultLookback)
      : Dataset[TeamForm] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.team)
      .flatMapGroupsWithState[FormBuf, TeamForm](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateTeam(lookback))
  }

  /** Time-windowed variant — the streaming-native form of the 90-day
    * rolling metrics A1–A3 (`utils/data_utils.py:238-301`): state keeps
    * only entries within `windowDays` of the newest processed match, so
    * per-team state is bounded by window density, and each emitted row
    * equals the batch `rangeBetween(-windowDays·86400, 0)` frame.
    * Integer half-points keep the ratio exact.
    */
  def updateTeamByDays(windowDays: Int)(
      team: String, rows: Iterator[MatchResult],
      state: GroupState[FormBuf]): Iterator[TeamForm] = {
    val windowMs = windowDays.toLong * 86400000L
    var buf = state.getOption.getOrElse(FormBuf(Nil)).entries
    val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.matchId)).map { r =>
      buf = ((r.ts.getTime, r.matchId, r.result, r.goalsFor) :: buf)
        .filter(_._1 >= r.ts.getTime - windowMs) // inclusive [t-w, t]
      val n = buf.size
      val halfPts = buf.map(e => (points(e._3) * 2).toLong).sum
      val goals = buf.map(_._4).sum
      TeamForm(team, r.matchId, n, halfPts.toDouble / 2.0 / n, goals / n)
    }
    state.update(FormBuf(buf))
    out.iterator
  }

  def rollingFormByDays(ds: Dataset[MatchResult], windowDays: Int = 90)
      : Dataset[TeamForm] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.team)
      .flatMapGroupsWithState[FormBuf, TeamForm](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateTeamByDays(windowDays))
  }
}
