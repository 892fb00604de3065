package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user running spend via `transformWithState` — Spark 4's arbitrary-
  * state API (the successor of `flatMapGroupsWithState`, RocksDB-backed,
  * with typed value/list/map state and per-state TTL).
  *
  * Why this operator exists beside `TeamFormState`: the old API holds ONE
  * opaque state object per key and rewrites it wholesale every batch; the
  * new handle gives named typed states with independent TTLs, which is
  * what long-running ingest accounting needs (a 100 TB firehose cannot
  * afford unbounded per-key state — here the counter state expires after
  * `ttl` of key inactivity, enforced by the store, not by user code).
  *
  * Emits one `(user_id, events, total_cents)` row per key per batch —
  * exact integer cents, so batch outputs are reproducible and the final
  * per-key row equals the batch aggregate (spec-checked).
  */
object RunningSpend {

  case class Spend(user_id: Long, cents: Long)
  case class SpendState(events: Long, total_cents: Long)
  case class SpendUpdate(user_id: Long, events: Long, total_cents: Long)

  class Processor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Spend, SpendUpdate] {
    @transient private var state: ValueState[SpendState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SpendState]("spend",
        Encoders.product[SpendState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Spend],
                                 timers: TimerValues): Iterator[SpendUpdate] = {
      val prev = if (state.exists()) state.get() else SpendState(0L, 0L)
      var n = prev.events
      var total = prev.total_cents
      rows.foreach { r => n += 1; total += r.cents }
      state.update(SpendState(n, total))
      Iterator.single(SpendUpdate(key, n, total))
    }
  }

  /** Wire the processor over a streaming events frame (`user_id`,
    * `value`): value is converted to exact integer cents scan-side.
    *
    * A real TTL requires `TimeMode.ProcessingTime` — the store stamps
    * each state write with the batch's processing time and expires it
    * against that clock; under `TimeMode.None` Spark rejects any
    * non-NONE TTLConfig at query start. The time mode is therefore
    * derived from the ttl argument rather than hardcoded.
    */
  def updates(events: Dataset[org.apache.spark.sql.Row],
              ttl: TTLConfig = TTLConfig.NONE): Dataset[SpendUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .select(col("user_id").cast("long").as("user_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .as[Spend]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(ttl), timeMode,
        OutputMode.Update(), Encoders.product[SpendUpdate])
  }

  /** The RocksDB provider `transformWithState` requires, as session confs
    * (set before starting the query).
    */
  def requiredConfs(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
