package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded frequent-items summary: classic Misra–Gries (Misra & Gries
  * '82) with the lazy global-decrement trick, plus the mergeable-
  * summaries merge (Agarwal et al., PODS'12): two summaries combine by
  * counter-wise addition, then the (k+1)-th largest count is
  * subtracted from every counter and non-positive entries drop —
  * preserving the ε = n/k error bound, which is what makes the sketch
  * partial-aggregable in a shuffle.
  *
  * The GUARANTEE the engine builds on: any item with true frequency
  * > n/k survives in the summary no matter how the input was
  * partitioned. Candidate SETS can differ run to run (deterministic
  * plans aside), so the summary itself is never gated — the heavy-
  * hitter query recounts candidates exactly and thresholds, making
  * the final output a pure function of the data.
  */
final class MGSummary(val k: Int) {
  val counts = new java.util.HashMap[String, java.lang.Long]()

  def add(term: String): Unit = {
    val cur = counts.get(term)
    if (cur != null) counts.put(term, cur + 1L)
    else if (counts.size < k) counts.put(term, 1L)
    else {
      // global decrement: every tracked counter −1, zeros evict (the
      // untracked newcomer cancels against them — MG's amortization)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove()
        else e.setValue(e.getValue - 1L)
      }
    }
  }

  def mergeFrom(other: MGSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey,
        if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count, drop ≤ 0 (PODS'12 merge)
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(counts.size - k - 1) // (k+1)-th largest
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= cut) ei.remove()
        else e.setValue(e.getValue - cut)
      }
    }
  }

  /** Tracked (term, residual count) entries, sorted lexicographically
    * by term (a deterministic order for a given summary; the summary
    * itself is partitioning-dependent — consumers must recount). */
  def sortedEntries: Array[(String, Long)] = {
    val arr = counts.keySet().toArray(new Array[String](counts.size))
    java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[String]())
    arr.map(t => (t, counts.get(t).longValue()))
  }
}

/** `graft_heavy_hitters(term, k)` — single-pass mergeable frequent-
  * items candidates over a string column: at most k terms, guaranteed
  * to include every term with frequency > n/k. Shuffle volume is
  * groups×k entries regardless of n (the map-side summaries merge);
  * the full GROUP BY it replaces shuffles the whole key space. Pair
  * with an exact recount of the ≤ k candidates (a broadcast-sized
  * IN-list) to get exact heavy hitters in two scans at any scale. */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {

  require(k > 0, "graft_heavy_hitters: k must be positive")

  override def prettyName: String = "graft_heavy_hitters"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string term column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MGSummary): Any =
    new GenericArrayData(buffer.sortedEntries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.toSeq)

  override def serialize(buffer: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // versioned wire format: these bytes can outlive the process (a
    // streaming stateful aggregation persists partial buffers in the
    // state store across restarts), so the layout carries a negative
    // magic + version up front. The unversioned v1 layout started
    // with k — always positive — which is how deserialize tells a
    // pre-version checkpoint apart and still reads it.
    out.writeInt(MisraGries.WireMagic)
    out.writeInt(2)
    out.writeInt(buffer.k)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed raw UTF-8, not writeUTF: the function is
      // registered over arbitrary string columns and writeUTF throws
      // UTFDataFormatException past 65535 encoded bytes per term
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val first = in.readInt()
    if (first == MisraGries.WireMagic) {
      val version = in.readInt()
      require(version == 2, s"unknown MisraGries buffer version $version")
      val s = new MGSummary(in.readInt())
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val kb = new Array[Byte](in.readInt())
        in.readFully(kb)
        val term = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
        s.counts.put(term, in.readLong())
        i += 1
      }
      s
    } else {
      // legacy v1 (no magic; first int is k, terms via writeUTF) — a
      // state-store checkpoint written before the format gained the
      // version header must still restore
      val s = new MGSummary(first)
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val term = in.readUTF()
        s.counts.put(term, in.readLong())
        i += 1
      }
      s
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Negative magic heading the versioned buffer layout — k (the v1
    * head field) is always positive, so the two cannot collide. */
  val WireMagic: Int = -0x4D475332 // ~"MGS2"
  /** Column-level entry point: ≤ k frequent-item candidates per group
    * as term-sorted `array<struct<term, cnt>>` — `cnt` is the MG
    * residual (a lower bound on true frequency, within n/k of it),
    * carried so summaries landed by independent jobs (micro-batches,
    * per-day corpora) can be re-merged; it is NOT an exact count. */
  def apply(term: Column, k: Int): Column =
    Bridge.column(
      MisraGries(Bridge.expression(term), k).toAggregateExpression())
}
