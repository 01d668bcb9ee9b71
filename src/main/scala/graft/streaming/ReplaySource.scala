package graft.streaming

import java.util
import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** T1/T2 as a REAL Structured Streaming source (reference contract:
  * main.py:39-44): a rate-limited `MicroBatchStream` that replays a
  * recorded parquet table grouped by timestamp, ascending, pacing
  * emission by scaled event-time gaps.
  *
  * Why a source and not the driver loop (`Replay.replay`): offsets are
  * CHECKPOINTABLE — a restarted query resumes from the last committed
  * timestamp group with the pacing clock re-anchored, and the stream
  * composes with watermarks and downstream stateful operators. The
  * driver-loop form stays for exact reference parity (its pacing math
  * is pinned by ReplaySpec).
  *
  * Offset model: index into the sorted distinct-timestamp schedule
  * (`groupIdx` = number of groups fully emitted). The schedule itself
  * (one long per distinct timestamp) is driver-resident metadata, same
  * scale as a file-source listing. Each micro-batch admits only groups
  * whose cumulative scaled gap has elapsed on the wall clock
  * (`timeScale` option; 0 = as fast as possible), capped at
  * `maxGroupsPerTrigger` so a cold start with a deep backlog drains in
  * bounded batches instead of one giant one. Group rows are staged per
  * micro-batch — peak driver memory is one trigger's groups, mirroring
  * the reference producer's one-batch-in-flight design.
  *
  * Options:
  *   - `path`            parquet file/dir to replay (required)
  *   - `tsMillisExpr`    SQL expr → epoch-millis group key (required)
  *   - `keyExpr`         SQL expr → partition key    (default: path tail)
  *   - `payloadExpr`     SQL expr → payload string   (required)
  *   - `timeScale`       gap multiplier, 0 = no pacing (default 0)
  *   - `maxGroupsPerTrigger` admission cap (default 10000)
  */
class ReplaySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-replay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplaySource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ReplayTable(new CaseInsensitiveStringMap(properties))
}

object ReplaySource {
  val Schema: StructType = StructType(Seq(
    StructField("ts_ms", LongType, nullable = false),
    StructField("partition_key", StringType),
    StructField("payload", StringType)))
}

class ReplayTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"graft-replay(${options.get("path")})"
  override def schema(): StructType = ReplaySource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = ReplaySource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ReplayMicroBatchStream(options)
    }
}

/** Serializable offset: number of timestamp groups fully emitted. */
case class ReplayOffset(groupIdx: Int) extends Offset {
  override def json: String = s"""{"groupIdx":$groupIdx}"""
}

object ReplayOffset {
  private val Re = """\{"groupIdx":(\d+)\}""".r
  def fromJson(s: String): ReplayOffset = s match {
    case Re(n) => ReplayOffset(n.toInt)
    case _     => throw new IllegalArgumentException(s"bad replay offset: $s")
  }
}

/** One timestamp group per partition — preserves the reference's
  * group-at-a-time emission unit and parallelizes a trigger across its
  * admitted groups. */
case class ReplayInputPartition(rows: Array[(Long, String, String)]) extends InputPartition

class ReplayMicroBatchStream(
    options: CaseInsensitiveStringMap,
    clock: () => Long = () => System.currentTimeMillis())
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow with Logging {

  private val path = Option(options.get("path"))
    .getOrElse(throw new IllegalArgumentException("graft-replay requires 'path'"))
  private val tsMillisExpr = Option(options.get("tsMillisExpr"))
    .getOrElse(throw new IllegalArgumentException("graft-replay requires 'tsMillisExpr'"))
  private val keyExpr = Option(options.get("keyExpr")).getOrElse("'replay'")
  private val payloadExpr = Option(options.get("payloadExpr"))
    .getOrElse(throw new IllegalArgumentException("graft-replay requires 'payloadExpr'"))
  private val timeScale = Option(options.get("timeScale")).map(_.toDouble).getOrElse(0.0)
  private val maxGroupsPerTrigger =
    Option(options.get("maxGroupsPerTrigger")).map(_.toInt).getOrElse(10000)

  private def spark = SparkSession.active

  private def projected =
    spark.read.parquet(path).selectExpr(
      s"CAST(($tsMillisExpr) AS BIGINT) AS ts_ms",
      s"CAST(($keyExpr) AS STRING) AS partition_key",
      s"CAST(($payloadExpr) AS STRING) AS payload")

  /** The replay schedule: sorted distinct group timestamps, plus each
    * group's cumulative due-time (the reference's sleep sum: first
    * group immediate, then max(0, gap)·timeScale — main.py:39-44).
    * Metadata-scale (one long per group), computed once per stream. */
  private lazy val schedule: (Array[Long], Array[Long]) = {
    import org.apache.spark.sql.functions.col
    val ts = projected.select(col("ts_ms")).distinct().orderBy(col("ts_ms"))
      .collect().map(_.getLong(0))
    val due = new Array[Long](ts.length)
    var i = 1
    while (i < ts.length) {
      due(i) = due(i - 1) + math.max(0L, ((ts(i) - ts(i - 1)) * timeScale).toLong)
      i += 1
    }
    (ts, due)
  }

  // wall-clock anchor for pacing; re-established after restart so a
  // resumed query continues the schedule from its committed offset
  @volatile private var anchorWall: Long = -1L
  @volatile private var drainAll: Boolean = false

  override def prepareForTriggerAvailableNow(): Unit = { drainAll = true }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): Offset = ReplayOffset(0)

  override def deserializeOffset(json: String): Offset = ReplayOffset.fromJson(json)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val (ts, due) = schedule
    val from = start.asInstanceOf[ReplayOffset].groupIdx
    if (anchorWall < 0L) anchorWall = clock() - (if (from > 0) due(from - 1) else 0L)
    val dueNow =
      if (drainAll || timeScale <= 0.0) ts.length
      else {
        val elapsed = clock() - anchorWall
        var hi = from
        while (hi < ts.length && due(hi) <= elapsed) hi += 1
        hi
      }
    ReplayOffset(math.min(dueNow, from + maxGroupsPerTrigger))
  }

  override def reportLatestOffset(): Offset = ReplayOffset(schedule._1.length)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (ts, _) = schedule
    val from = start.asInstanceOf[ReplayOffset].groupIdx
    val to = end.asInstanceOf[ReplayOffset].groupIdx
    if (to <= from) return Array.empty
    import org.apache.spark.sql.functions.col
    val lo = ts(from)
    val hi = ts(to - 1)
    // stage ONE trigger's groups driver-side (bounded by
    // maxGroupsPerTrigger) — the replay unit is small by construction;
    // the range filter is pushed to the parquet scan
    val staged = projected
      .filter(col("ts_ms") >= lo && col("ts_ms") <= hi)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(_._1)
    ts.slice(from, to).map(t =>
      ReplayInputPartition(staged.getOrElse(t, Array.empty)): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rows = partition.asInstanceOf[ReplayInputPartition].rows
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = {
            val (t, k, p) = rows(i)
            new GenericInternalRow(Array[Any](t,
              if (k == null) null else UTF8String.fromString(k),
              if (p == null) null else UTF8String.fromString(p)))
          }
          override def close(): Unit = ()
        }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
