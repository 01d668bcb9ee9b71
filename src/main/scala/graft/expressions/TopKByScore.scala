package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k heap: keeps the k best (score, id) pairs under the
  * total order "higher score wins, lower id breaks ties". Flat long
  * arrays in binary-heap layout (worst kept pair at the root) — no
  * boxing, O(log k) insert, O(k) serialized size.
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Long](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a strictly worse than b? (lower score, or same score + higher id) */
  @inline private def worse(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      val p = (i - 1) / 2
      val s = scores(i); val d = ids(i)
      scores(i) = scores(p); ids(i) = ids(p)
      scores(p) = s; ids(p) = d
      i = p
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) done = true
      else {
        val s = scores(i); val d = ids(i)
        scores(i) = scores(w); ids(i) = ids(w)
        scores(w) = s; ids(w) = d
        i = w
      }
    }
  }

  def insert(score: Long, id: Long): Unit =
    if (size < k) {
      scores(size) = score; ids(size) = id
      size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }

  /** Kept pairs, best-first. Direct comparator, not negation-sortBy —
    * `-Long.MinValue` overflows back to MinValue and would rank the
    * worst possible score first. */
  def sortedPairs: Array[(Long, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith { case ((sa, ia), (sb, ib)) => sa > sb || (sa == sb && ia < ib) }
}

/** Native single-pass top-k-per-group aggregate (the custom
  * `Aggregator` SURVEY §7.6 scoped for the similarity/dedup surface):
  * `graft_top_k(score, id, k)` keeps a bounded k-element heap per
  * group and returns `array<struct<score, id>>` best-first, ordered by
  * (score desc, id asc).
  *
  * Why not `row_number() over (partition by g order by s desc)`: the
  * window form SORTS every group's full row set (shuffling all n rows
  * to do it), while this aggregate is partial-aggregable — each map
  * task reduces its slice to ≤ k pairs per group BEFORE the exchange,
  * so shuffle volume is groups×k regardless of n, and no sort ever
  * materializes. That is the difference between a 100 TB top-k and a
  * 100 TB sort.
  */
case class TopKByScore(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k > 0, "graft_top_k: k must be positive")

  override def prettyName: String = "graft_top_k"
  override def nullable: Boolean = false

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint score, bigint id), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      buffer.insert(other.scores(i), other.ids(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedPairs.map { case (s, i) =>
      InternalRow(s, i)
    }.toSeq)

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * buffer.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeLong(buffer.scores(i))
      out.writeLong(buffer.ids(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val heap = new TopKHeap(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      // stored pairs are already heap-shaped for the same ordering, but
      // re-inserting keeps the invariant without trusting the layout
      heap.insert(in.readLong(), in.readLong())
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

object TopKByScore {
  /** Column-level entry point: top `k` (score, id) pairs per group. */
  def apply(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}
