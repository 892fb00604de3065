package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Last-k events per key as LIST state (`transformWithState` +
  * `ListState`) — the feature-store "recent activity" shape: each batch
  * folds new events into a bounded per-key ring and emits the refreshed
  * rolling feature row. Complements [[RunningSpend]] (value state) and
  * [[SessionTimeout]] (timers) so every `transformWithState` state kind
  * the engine uses is exercised AND auditable offline through the
  * `statestore` reader (see `StreamingSpec`).
  *
  * Scale shape: state per key is exactly ≤ k longs in the RocksDB list
  * column family — append + trim, no per-batch scan of the key space,
  * O(keys · k) total regardless of stream length.
  */
object RecentEvents {

  case class Evt(user_id: Long, cents: Long)
  case class Feature(user_id: Long, n_recent: Long, recent_cents: Long)

  class Processor(k: Int) extends StatefulProcessor[Long, Evt, Feature] {
    @transient private var recent
        : org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Long]("recent",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[Feature] = {
      val prior = recent.get().toArray
      val kept = (prior ++ rows.map(_.cents)).takeRight(k)
      recent.put(kept) // bounded: the store never holds more than k
      Iterator.single(Feature(key, kept.length.toLong, kept.sum))
    }
  }

  /** Wire the processor over a streaming (`user_id`, `value`) frame;
    * one exact-integer-cents feature row per key per batch. Requires
    * the RocksDB provider ([[RunningSpend.requiredConfs]]).
    */
  def features(events: Dataset[org.apache.spark.sql.Row],
               k: Int): Dataset[Feature] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .as[Evt]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(k), TimeMode.None(),
        OutputMode.Append(), Encoders.product[Feature])
  }
}
