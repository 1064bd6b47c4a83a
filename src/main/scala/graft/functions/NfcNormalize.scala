package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the canonical-composition step every cross-source text
  * dedup pipeline runs first (the same logical text arrives composed
  * from one source and decomposed from another; hash-dedup without
  * normalization silently misses those duplicates).
  *
  * Spark ships no normalization built-in, so the alternative is a Scala
  * UDF (serialization overhead, opaque to codegen). This expression
  * stays inside WholeStageCodegen via a static JVM call
  * (`java.text.Normalizer`, in the JDK since 6 — zero new
  * dependencies). Already-NFC input (the overwhelmingly common case)
  * short-circuits through `Normalizer.isNormalized` without
  * allocating. Oracle parity: DuckDB's `nfc_normalize` (utf8proc)
  * implements the same Unicode spec; cross-engine agreement on
  * composed/decomposed pairs is pinned in TextOpsSpec.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
