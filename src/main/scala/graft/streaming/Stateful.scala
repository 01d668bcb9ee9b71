package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
