package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-key categorical totals as MAP state (`transformWithState` +
  * `MapState`) — the feature-store "spend by category" shape: each batch
  * folds events into the per-user {category → cents} map and emits a
  * refreshed row for every category the batch touched. Completes the
  * state-kind coverage next to [[RunningSpend]] (value), [[RecentEvents]]
  * (list) and [[SessionTimeout]] (timers), and like them is auditable
  * offline through the `statestore` reader (see `StreamingSpec`).
  *
  * Scale shape: state per key is one RocksDB map column family keyed by
  * category — point get/put per touched (user, category), no scan of
  * untouched categories or keys, O(batch events) work per batch.
  */
object CategorySpend {

  case class Evt(user_id: Long, category: String, cents: Long)
  case class CatTotal(user_id: Long, category: String, total_cents: Long)

  class Processor extends StatefulProcessor[Long, Evt, CatTotal] {
    @transient private var totals: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getMapState[String, Long]("totals",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Evt],
                                 timers: TimerValues): Iterator[CatTotal] = {
      // LinkedHashSet: emit order = first-touch order, deterministic
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val cur =
          if (totals.containsKey(e.category)) totals.getValue(e.category)
          else 0L
        totals.updateValue(e.category, cur + e.cents)
        touched += e.category
      }
      touched.iterator.map(c => CatTotal(key, c, totals.getValue(c)))
    }
  }

  /** Wire the processor over a streaming (`user_id`, `category`, `value`)
    * frame; one exact-integer-cents row per touched (user, category) per
    * batch. Requires the RocksDB provider
    * ([[RunningSpend.requiredConfs]]).
    */
  def totals(events: Dataset[org.apache.spark.sql.Row])
      : Dataset[CatTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("category").cast("string").as("category"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .as[Evt]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Append(), Encoders.product[CatTotal])
  }
}
