package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Timer-driven sessionization via `transformWithState` — the state-API
  * capability neither TTL nor `session_window` expresses: a session is
  * EMITTED (not merely forgotten) when its key goes idle, from the
  * store's timer wheel, with no further input required for that key.
  *
  * `session_window` (w07) closes sessions against the EVENT-time
  * watermark — right for replayable event analytics. This operator
  * closes against PROCESSING time — right for operational accounting
  * (a crawl source that stops sending must surface its final session
  * even if no later event ever advances a watermark). Each input batch
  * folds rows into per-key value state and re-arms one timer `gapMs`
  * ahead; when the store's clock passes the deadline with no new input,
  * `handleExpiredTimer` emits the completed session and clears state —
  * bounded state, one emitted row per completed session.
  *
  * Sparse-trigger correctness: Spark feeds a batch's INPUT rows to the
  * processor before its EXPIRED timers, so with an infrequent trigger
  * (cron / AvailableNow) a key can receive new input in the same batch
  * whose timer should have closed its old session. State therefore
  * carries the last-event processing time; on input, if the gap already
  * elapsed since that stamp, the stale session is emitted and reset
  * FIRST and the new rows start a fresh session — the timer wheel is the
  * fast path, the input-side check is the correctness backstop.
  *
  * Scale shape: state and timers are per-key in the RocksDB store;
  * nothing scans the key space — expiry is the store's timer index, so
  * 100 M idle keys cost zero per-batch work beyond their own expirations.
  */
object SessionTimeout {

  case class Evt(user_id: Long, cents: Long)
  case class Sess(events: Long, total_cents: Long, last_ms: Long)
  case class SessionOut(user_id: Long, events: Long, total_cents: Long)

  class Processor(gapMs: Long)
      extends StatefulProcessor[Long, Evt, SessionOut] {
    @transient private var state: ValueState[Sess] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Sess]("session",
        Encoders.product[Sess], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[SessionOut] = {
      val now = timers.getCurrentProcessingTimeInMs()
      // Input-side staleness backstop (see scaladoc): if the gap already
      // elapsed since this key's last event, close the old session before
      // folding the new rows — materialized eagerly, BEFORE state.update.
      val stale: List[SessionOut] =
        if (state.exists() && now - state.get().last_ms > gapMs) {
          val s = state.get()
          state.clear()
          List(SessionOut(key, s.events, s.total_cents))
        } else Nil
      val prev = if (state.exists()) state.get() else Sess(0L, 0L, now)
      var n = prev.events
      var total = prev.total_cents
      rows.foreach { r => n += 1; total += r.cents }
      state.update(Sess(n, total, now))
      // re-arm: drop any previous deadline, set a fresh one gapMs ahead
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(now + gapMs)
      stale.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionOut] = {
      val out =
        if (state.exists()) {
          val sess = state.get()
          Iterator.single(SessionOut(key, sess.events, sess.total_cents))
        } else Iterator.empty
      state.clear()
      out
    }
  }

  /** Wire the processor over a streaming (`user_id`, `value`) frame;
    * emits one exact-integer-cents row per session closed by `gapMs` of
    * key inactivity. Requires the RocksDB provider
    * ([[RunningSpend.requiredConfs]]) and processing-time mode (timers).
    */
  def sessions(events: Dataset[org.apache.spark.sql.Row],
               gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .as[Evt]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(gapMs), TimeMode.ProcessingTime(),
        OutputMode.Append(), Encoders.product[SessionOut])
  }
}
