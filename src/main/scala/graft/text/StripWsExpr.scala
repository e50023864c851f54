package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python-`strip()`-alike as a byte-scanning codegen expression.
  * Semantically identical to `regexp_replace(c, "^\\s+|\\s+$", "")` (Java
  * `\s` = `[ \t\n\x0B\f\r]`, all ASCII), but ~an order of magnitude
  * cheaper: ASCII bytes never appear inside UTF-8 multi-byte sequences, so
  * trimming is a raw byte scan from both ends with no regex machinery and
  * no codepoint decode.
  */
object GraftStrings {
  @inline private def isWs(b: Byte): Boolean =
    b == ' '.toByte || (b >= 0x09 && b <= 0x0d) // \t \n \x0B \f \r

  def stripWs(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n && isWs(s.getByte(i))) i += 1
    var j = n
    while (j > i && isWs(s.getByte(j - 1))) j -= 1
    if (i == 0 && j == n) s
    else {
      val bytes = s.getBytes
      UTF8String.fromBytes(bytes, i, j - i)
    }
  }
}

case class StripWsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    GraftStrings.stripWs(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.GraftStrings.stripWs($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object StripWs {
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      StripWsExpr(org.apache.spark.sql.GraftBridge.expression(c)))
}
