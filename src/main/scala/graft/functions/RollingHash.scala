package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: Rabin-Karp rolling hash of a binary
  * column — `fold(h = (h * 31 + byte) mod 1e9+7)` over the raw bytes in
  * one codegen'd pass.
  *
  * The built-in-function formulation (hex-expand the bytes to a string,
  * `transform(sequence(...))` a per-byte index array, `conv` each
  * 2-char slice back to an int, `aggregate` the fold) is semantically
  * identical but allocates a string and an array element per byte; the
  * honest noop-sink bench measured it at 7.9s on the sf0.1 corpus —
  * the slowest query in the engine. This expression is the same fold
  * with zero per-byte allocation, and is where the mandate's preference
  * order points: a native Expression with doGenCode once the built-in
  * composition is measured to be the bottleneck.
  *
  * Byte values fold unsigned (& 0xff), matching DuckDB's hex-pair
  * oracle and a byte-stream Rabin-Karp chunker. Empty input → 0.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_roll expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |long $h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = ($h * 31L + ($b[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
