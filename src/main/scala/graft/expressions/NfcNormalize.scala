package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization (UAX#15
  * canonical composition) — the first step of every text-cleaning
  * pipeline and absent from Spark's built-in function set. Kernel is
  * `java.text.Normalizer` (the JDK's ICU-derived implementation of the
  * same public standard DuckDB's `nfc_normalize` implements, so the
  * engines agree by construction). ASCII fast path: NFC is the
  * identity on ASCII, so an all-ASCII UTF8String is returned as-is
  * with zero allocation — at corpus scale the normalizer only pays for
  * the rows that can actually change.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) s // all-ASCII: NFC is the identity
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  /** Column-level entry point. */
  def apply(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
