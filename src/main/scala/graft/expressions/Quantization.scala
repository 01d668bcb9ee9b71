package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Per-vector symmetric int8-style scalar quantization of an
  * `array<float>` embedding: `q_i = ⌊v_i · (127 / max|v|) + 0.5⌋`,
  * yielding ints in [-127, 127]. Zero vectors quantize to all zeros.
  *
  * This is the standard memory-bandwidth lever for billion-scale
  * similarity search (FAISS SQ8, public): a 100 TB float corpus
  * becomes 25 TB of int8 codes, and candidate scoring moves 4× less
  * data per comparison. The rounding is `floor(x + 0.5)` — NOT
  * half-even `rint` — because `floor` is the one rounding primitive
  * with identical semantics in the JVM and DuckDB, which keeps the
  * quantized codes (and therefore quantized rankings) engine-exact.
  *
  * Precondition: FINITE inputs. NaN/±Inf elements degrade to 0 codes
  * on the JVM (`Double.toInt` of NaN is 0) and other engines disagree
  * on NaN casts — validate embeddings upstream (the quality gate's
  * job) rather than relying on this path for non-finite data. The
  * behavior is pinned by a test so a change is loud, not silent.
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_quantize_i8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    QuantizeI8.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.QuantizeI8.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)
}

object QuantizeI8 {
  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var maxAbs = 0.0d
    var i = 0
    while (i < n) {
      val x = math.abs(v.getFloat(i).toDouble)
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val out = new Array[Int](n)
    if (maxAbs > 0.0d) {
      val s = 127.0d / maxAbs
      i = 0
      while (i < n) {
        out(i) = math.floor(v.getFloat(i).toDouble * s + 0.5d).toInt
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column = Bridge.column(QuantizeI8(Bridge.expression(c)))
}

/** Integer dot product over two `array<int>` quantized codes — exact
  * 64-bit accumulation (no rounding at all, so cross-engine parity is
  * trivial), one codegen'd loop. Mismatched lengths throw, same
  * contract as [[FloatDot]]. */
case class IntDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_int_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.IntDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_int_dot: length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(IntDot(Bridge.expression(a), Bridge.expression(b)))
}
