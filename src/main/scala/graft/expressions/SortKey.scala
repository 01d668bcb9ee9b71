package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving double → long sort key (the IEEE-754 total-order
  * bit trick): flip the low 63 bits of negatives so that signed-long
  * comparison of the keys matches double comparison of the values.
  *
  * `key(a) < key(b) ⇔ a < b` for all finite doubles; the mapping is
  * injective on VALUES (distinct doubles → distinct longs; -0.0 is
  * normalized to +0.0 first, so the two zeros — equal as doubles —
  * get equal keys and tie-break by id like any other tie). NaN maps
  * above +Inf, matching Spark SQL's double ordering. This is the
  * adapter that lets a
  * floating-point similarity score ride the bounded-heap
  * [[TopKByScore]] aggregate (long scores) without changing any
  * ranking: top-k by `graft_sort_key(sim)` ≡ top-k by `sim`, but the
  * physical plan becomes a partial-aggregable groups×k shuffle instead
  * of a full per-group window sort.
  */
case class DoubleSortKey(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sort_key"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    DoubleSortKey.key(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DoubleSortKey.key($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleSortKey =
    copy(child = newChild)
}

object DoubleSortKey {
  /** Self-inverse on its range: re-applying the bit transform to a key
    * recovers the (zero-normalized) double. The `== 0.0` branch folds
    * -0.0 into +0.0 — without it the two zeros, EQUAL as doubles,
    * would get keys -1 and 0 and order by sign instead of by id. */
  def key(x: Double): Long = {
    val v = if (x == 0.0d) 0.0d else x
    val b = java.lang.Double.doubleToLongBits(v)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  def apply(c: Column): Column = Bridge.column(DoubleSortKey(Bridge.expression(c)))
}
