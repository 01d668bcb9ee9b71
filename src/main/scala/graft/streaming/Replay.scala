package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** T1/T2 — event-time-paced replay of timestamp-grouped batches into a
  * keyed record sink (reference: main.py:37-51).
  *
  * Faithful semantics:
  *   - batches arrive grouped by timestamp, ascending (T2);
  *   - sleep (ts − last_ts)/1000 seconds between batches, clamped to 0
  *     for the out-of-order case, first batch immediate (last_ts = ∞);
  *   - batch errors are logged and swallowed — at-most-once (T4);
  *   - all records of a batch share one partition key (T3).
  *
  * The pacing loop is inherently a single ordered driver-side walk (it
  * IS the reference's design — a paced producer); data stays
  * distributed until each batch is fetched via `toLocalIterator`, so
  * peak driver memory is one timestamp-batch, not the dataset. A
  * `timeScale` factor compresses the event-time gaps for tests
  * (timeScale = 0 → replay as fast as possible).
  */
object Replay extends Logging {

  final case class ReplayStats(batches: Long, records: Long, failures: Long,
      sleptMillis: Long)

  /** `tsCol` must evaluate to epoch milliseconds (the reference's replay
    * clock unit — main.py:42). */
  def replay(
      df: DataFrame,
      tsCol: org.apache.spark.sql.Column,
      payloadCol: String,
      partitionKey: String,
      stream: String,
      producer: RecordProducer,
      timeScale: Double = 1.0,
      sleeper: Long => Unit = Thread.sleep): ReplayStats = {

    val grouped = df
      .groupBy(tsCol.cast("long").as("ts"))
      .agg(collect_list(col(payloadCol).cast("string")).as("batch"))
      .orderBy(col("ts"))

    var lastTs = Long.MaxValue // first batch immediate (main.py:39)
    var batches = 0L
    var records = 0L
    var failures = 0L
    var slept = 0L

    val it = grouped.toLocalIterator()
    while (it.hasNext) {
      val row: Row = it.next()
      val ts = row.getLong(0)
      val payloads = row.getSeq[String](1)
      val waitMs = if (lastTs < ts) ((ts - lastTs) * timeScale).toLong else 0L
      if (waitMs > 0) { sleeper(waitMs); slept += waitMs }
      try {
        val recs = payloads.map(p => ProducedRecord(partitionKey, p.getBytes("UTF-8")))
        recs.grouped(producer.maxBatchRecords).foreach { g =>
          val results = producer.putRecords(stream, g)
          failures += results.count(_.failed)
        }
        records += payloads.size
      } catch {
        case e: Exception => // at-most-once (main.py:45-49)
          logError(s"Error producing batch at ts=$ts: ${e.getMessage}")
      }
      batches += 1
      lastTs = ts
    }
    ReplayStats(batches, records, failures, slept)
  }
}
