package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native random-hyperplane sign-bit hash over an `array<float>`
  * embedding: bit j is set iff Σᵢ vᵢ·wᵢⱼ ≥ 0, where the ±1 plane
  * weight is bit 6 of (i·73856093 XOR j·19349663).
  *
  * This is the hot primitive under embedding LSH (a02 buckets, d08
  * banded blocking). The higher-order-function formulation evaluates
  * an interpreted lambda per (plane × dimension) and is re-inlined by
  * CollapseProject into every consumer — measured ~4× of d08's wall
  * time at sf0.1. Here it is one branch-free codegen'd loop.
  *
  * Bit-for-bit identical to the HOF form (`Vectors.lshBucketHof`,
  * pinned by AnalyticsSpec) and to the DuckDB oracle twin
  * (`Sql.lshBits`): same plane weights, same ascending-index IEEE
  * double accumulation, same Σ 2^j bucket encoding.
  */
case class HyperplaneBits(child: Expression, nPlanes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hyperplane_bits"

  // analysis-time rejection, same contract as FloatDot/QuantizeI8: via
  // the registered SQL function an array<double> argument would reach
  // ArrayData.getFloat, which on unsafe layouts misreads 8-byte doubles
  // as 4-byte floats and produces silently wrong LSH bits
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if nPlanes >= 1 && nPlanes <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires nPlanes in [1, 62], got $nPlanes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBits.hash(input.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HyperplaneBits.hash($c, $nPlanes)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
}

object HyperplaneBits {
  def hash(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    var bits = 0L
    var j = 0
    while (j < nPlanes) {
      var acc = 0.0d
      var i = 0
      while (i < n) {
        val w =
          if ((((i.toLong * 73856093L) ^ (j.toLong * 19349663L)) >> 6 & 1L) == 0L) 1.0d
          else -1.0d
        acc += v.getFloat(i).toDouble * w
        i += 1
      }
      if (acc >= 0.0d) bits |= 1L << j
      j += 1
    }
    bits
  }
}
