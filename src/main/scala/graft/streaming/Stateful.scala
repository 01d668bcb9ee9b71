package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming operators (beyond the reference's surface — it has
  * no stateful machinery at all, SURVEY §2.9 — but any long-running
  * ingest of its telemetry needs keyed state; Spark's
  * mapGroupsWithState is the idiomatic carrier).
  */
object Stateful {

  final case class KeyCount(key: String, n: Long)

  /** Running per-key record counts across micro-batches. Emits the
    * updated count for each key seen in a batch (Update output mode);
    * the latest emission per key is the running total. State is one
    * long per key — bounded by key cardinality, not stream length. */
  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, n_types: Long,
      max_value: Double)

  /** Per-user statistics on the arbitrary-state API (`transformWithState`,
    * Spark 4): TYPED state variables — a ValueState counter, a MapState
    * of seen event types, a ValueState running max — instead of
    * mapGroupsWithState's single opaque blob. The practical difference
    * at scale: each variable reads/writes independently in the state
    * store (a batch touching only the counter doesn't deserialize the
    * type map), and per-variable TTL is available on the same handle.
    * Every emitted stat is order-independent (count, set size, max), so
    * the final per-key emission is identical under ANY micro-batch
    * slicing — which is what lets a batch SQL oracle check a streaming
    * run. State per key: one long, one small map (≤ type-domain
    * entries), one double — bounded by key cardinality. */
  class UserStatsProcessor extends StatefulProcessor[Long, UserEvent, UserStats] {
    @transient private var nEvents: ValueState[Long] = _
    @transient private var typeSeen: MapState[String, Boolean] = _
    @transient private var maxValue: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nEvents = getHandle.getValueState[Long]("n_events", Encoders.scalaLong, TTLConfig.NONE)
      typeSeen = getHandle.getMapState[String, Boolean]("types",
        Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
      maxValue = getHandle.getValueState[Double]("max_value",
        Encoders.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserStats] = {
      var n = if (nEvents.exists()) nEvents.get() else 0L
      var mx = if (maxValue.exists()) maxValue.get() else Double.NegativeInfinity
      rows.foreach { e =>
        n += 1
        typeSeen.updateValue(e.event_type, true)
        if (e.value > mx) mx = e.value
      }
      nEvents.update(n)
      maxValue.update(mx)
      Iterator.single(UserStats(key, n, typeSeen.keys().size.toLong, mx))
    }
  }

  def runningCounts(ds: Dataset[String]): Dataset[KeyCount] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val kcEnc: Encoder[KeyCount] = Encoders.product[KeyCount]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    ds.groupByKey(identity)
      .mapGroupsWithState[Long, KeyCount](GroupStateTimeout.NoTimeout) {
        (key: String, values: Iterator[String], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + values.size
          state.update(n)
          KeyCount(key, n)
      }
  }
}
