package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** K3/T3/T4 — the keyed record sink boundary.
  *
  * The engine core depends on this interface, not on any cloud SDK
  * (SURVEY §7.4: "pluggable client interface; in-proc stub for tests —
  * no AWS SDK dependency in the engine core"). A production deployment
  * implements it over a real Kinesis client; tests and the correctness
  * queries use [[InMemoryRecordProducer]].
  */
final case class ProducedRecord(partitionKey: String, data: Array[Byte])

/** Per-record ACK, mirroring the put_records response the reference
  * inspects (reference: main.py:26-34): either a sequence number +
  * shard id, or an error code + message. */
final case class PutResult(
    sequenceNumber: String,
    shardId: String,
    errorCode: String,
    errorMessage: String) {
  def failed: Boolean = errorCode != null
}

trait RecordProducer extends Serializable {
  /** Service cap per call (AWS public limit: 500 records / put_records). */
  def maxBatchRecords: Int = 500

  def putRecords(stream: String, records: Seq[ProducedRecord]): Seq[PutResult]
}

/** Deterministic in-process stub: shard = hash of partition key into
  * `nShards`; sequence numbers are a global monotone counter; optional
  * failure injection via `failWhen` for at-most-once tests. */
final class InMemoryRecordProducer(
    nShards: Int = 4,
    failWhen: ProducedRecord => Boolean = _ => false)
  extends RecordProducer {

  private val seq = new AtomicLong(0L)
  private val stored = new ConcurrentLinkedQueue[(String, String, String, Array[Byte])]()

  def putRecords(stream: String, records: Seq[ProducedRecord]): Seq[PutResult] = {
    require(records.size <= maxBatchRecords,
      s"putRecords called with ${records.size} > $maxBatchRecords records")
    records.map { r =>
      if (failWhen(r)) PutResult(null, null, "ProvisionedThroughputExceededException", "injected failure")
      else {
        val shard = s"shardId-${math.floorMod(r.partitionKey.hashCode, nShards)}"
        val s = seq.incrementAndGet().toString
        stored.add((stream, r.partitionKey, shard, r.data))
        PutResult(s, shard, null, null)
      }
    }
  }

  /** Everything successfully stored: (stream, partitionKey, shardId, data). */
  def records: Seq[(String, String, String, Array[Byte])] = stored.asScala.toSeq
}
