package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Primitive float-vector kernels for pair-scan paths. The `Column` HOF
  * versions ([[Ann.dot]]) are CodegenFallback (interpreted per element)
  * and a ScalaUDF boxes every element into a `Seq[Float]` — on a blocked
  * self-join scoring 10^5+ pairs both dominate the query. These codegen
  * expressions call a static primitive loop on the raw `ArrayData`:
  * no boxing, no interpreter, bit-identical math to [[Ann.dot]] — for
  * WELL-FORMED embeddings (equal-length arrays, no null elements). On
  * malformed input the two diverge: `dot` truncates to the shorter array
  * where the HOF's `zip_with` null-pads, and `toFloatArray` throws on
  * null elements where the HOF null-propagates. Embedding columns in this
  * engine are fixed-dimension non-null by construction, so the fast
  * kernels are used only on such columns.
  */
object FloatVec {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
    acc
  }

  def norm(a: ArrayData): Double = {
    val x = a.toFloatArray()
    var acc = 0.0
    var i = 0
    while (i < x.length) { acc += x(i).toDouble * x(i).toDouble; i += 1 }
    math.sqrt(acc)
  }
}

private object VectorExprs {
  def checkFloatArray(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$side requires array<float>, got $other")
  }
}

case class FloatDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorExprs.checkFloatArray(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorExprs.checkFloatArray(right.dataType, "right")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    FloatVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.similarity.FloatVec.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

case class FloatNormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkFloatArray(child.dataType, "input")
  override def nullSafeEval(a: Any): Any =
    FloatVec.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.similarity.FloatVec.norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object FloatDot {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(FloatDotExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

object FloatNorm {
  def apply(c: Column): Column =
    GraftBridge.column(FloatNormExpr(GraftBridge.expression(c)))
}
