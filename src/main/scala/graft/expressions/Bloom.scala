package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic split-mix double hashing shared by the build and
  * probe sides. The filter's wire format is
  * `[4-byte big-endian numHashes][8-byte big-endian words ...]` —
  * `numBits = 64 * numWords` — so a filter built on one cluster (or
  * persisted next to a corpus as a maintenance artifact) probes
  * identically anywhere.
  */
object Bloom {
  /** splitmix64 finalizer — avalanche mix, public-domain constant set. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Probe `key` against a serialized filter. Zero-allocation hot
    * path: reads words straight out of the byte array. `graft_bloom_
    * contains` is a public SQL function, so a malformed blob must fail
    * loudly here, not index out of bounds or answer vacuously — the
    * header+words shape is validated before the first probe. */
  def contains(filter: Array[Byte], key: Long): Boolean = {
    require(filter.length >= 12 && (filter.length - 4) % 8 == 0,
      s"graft_bloom_contains: malformed filter (${filter.length} bytes; " +
        "expected a 4-byte header plus at least one 8-byte word)")
    val numHashes = readInt(filter, 0)
    require(numHashes >= 1 && numHashes <= 16,
      s"graft_bloom_contains: numHashes $numHashes outside [1, 16] — " +
        "not a graft_bloom_agg artifact")
    val numBits = (filter.length - 4).toLong * 8L
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5DEECE66DL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i.toLong * h2) & Long.MaxValue) % numBits
      // words serialize big-endian: bit b of a word lives in serialized
      // byte 7-(b>>>3) of that word's 8-byte group, at in-byte position b&7
      val bitInWord = (bit & 63).toInt
      val byteIdx = 4 + (bit >>> 6).toInt * 8 + (7 - (bitInWord >>> 3))
      if ((filter(byteIdx) & (1 << (bitInWord & 7))) == 0) return false
      i += 1
    }
    true
  }

  @inline private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
}

/** Mutable build-side buffer: a flat long-word bitset. */
final class BloomBuffer(val numWords: Int, val numHashes: Int) {
  val words = new Array[Long](numWords)

  def add(key: Long): Unit = {
    val numBits = numWords.toLong * 64L
    val h1 = Bloom.mix(key)
    val h2 = Bloom.mix(key ^ 0x5DEECE66DL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i.toLong * h2) & Long.MaxValue) % numBits
      words((bit >>> 6).toInt) |= (1L << (bit & 63).toInt)
      i += 1
    }
  }

  def mergeFrom(other: BloomBuffer): Unit = {
    require(other.numWords == numWords && other.numHashes == numHashes,
      s"bloom merge of mismatched filters: ($numWords words, $numHashes hashes)" +
        s" vs (${other.numWords} words, ${other.numHashes} hashes)")
    var i = 0
    while (i < numWords) { words(i) |= other.words(i); i += 1 }
  }

  /** Wire format shared with [[Bloom.contains]]. */
  def toBytes: Array[Byte] = {
    val out = new Array[Byte](4 + numWords * 8)
    out(0) = (numHashes >>> 24).toByte; out(1) = (numHashes >>> 16).toByte
    out(2) = (numHashes >>> 8).toByte; out(3) = numHashes.toByte
    var i = 0
    while (i < numWords) {
      val w = words(i)
      val off = 4 + i * 8
      var b = 0
      while (b < 8) { out(off + b) = (w >>> (56 - 8 * b)).toByte; b += 1 }
      i += 1
    }
    out
  }
}

/** `graft_bloom_agg(key, numBits, numHashes)` — builds a Bloom filter
  * over a bigint key column and returns it as one binary value.
  *
  * This is the explicit, reusable form of the runtime row-level filter
  * a warehouse engine injects for selective joins: build the filter
  * over the small (already-filtered) dimension side, then prune the
  * 100 TB fact side at the SCAN — before any exchange — with
  * [[BloomContains]]. Partial-aggregable: each map task ORs its local
  * bitset, the exchange moves one `numBits/8`-byte blob per partition,
  * never the keys. Unlike an `IN` broadcast list the size is fixed
  * upfront, and unlike AQE's automatic filter the artifact can be
  * PERSISTED (it is just bytes) and applied to tomorrow's increment
  * without re-reading the dimension.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0,
    "graft_bloom_agg: numBits must be a positive multiple of 64")
  require(numHashes >= 1 && numHashes <= 16,
    "graft_bloom_agg: numHashes must be in [1, 16]")

  override def prettyName: String = "graft_bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(numBits / 64, numHashes)

  override def update(buffer: BloomBuffer, input: InternalRow): BloomBuffer = {
    val k = child.eval(input)
    if (k != null) buffer.add(k.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: BloomBuffer): Any = buffer.toBytes

  override def serialize(buffer: BloomBuffer): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val numHashes = ((bytes(0) & 0xFF) << 24) | ((bytes(1) & 0xFF) << 16) |
      ((bytes(2) & 0xFF) << 8) | (bytes(3) & 0xFF)
    val numWords = (bytes.length - 4) / 8
    val buf = new BloomBuffer(numWords, numHashes)
    var i = 0
    while (i < numWords) {
      var w = 0L
      val off = 4 + i * 8
      var b = 0
      while (b < 8) { w = (w << 8) | (bytes(off + b) & 0xFFL); b += 1 }
      buf.words(i) = w
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

object BloomAgg {
  def apply(key: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(
      BloomAgg(Bridge.expression(key), numBits, numHashes).toAggregateExpression())
}

/** `graft_bloom_contains(filter, key)` — membership probe against a
  * [[BloomAgg]]-built filter. One codegen'd static call per row, no
  * allocation; false positives possible (bounded by the build sizing),
  * false negatives impossible — so `filter(contains)` before an exact
  * join prunes safely: the join discards the false positives.
  */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary filter, bigint key), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(filter: Any, key: Any): Any =
    Bloom.contains(filter.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, k) => s"graft.expressions.Bloom.contains($f, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  def apply(filter: Column, key: Column): Column =
    Bridge.column(BloomContains(Bridge.expression(filter), Bridge.expression(key)))
}
