package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All char-[minN, maxN]-grams of a string in ONE pass — the extraction
  * kernel behind `NaiveBayes.charGramsCol`. The builtin composition
  * (`transform(sequence(1, len-n+1), i => substr(s, i, n))`) calls
  * `substr` once per position, and each `substr` seeks its offset from
  * the string start — O(len) per call, O(len²) per document per width.
  * At sf0.1 (≈2 KB docs) that made char-gram NB training the suite's
  * most expensive line by far (~29 s). This kernel computes the
  * code-point offset table once and slices each gram directly: O(len ×
  * widths) total, same CODE-POINT semantics as `substr`/`length` on both
  * engines (astral chars count once), identical output order (widths
  * ascending, then position).
  */
final class CharGramsHolder(minN: Int, maxN: Int,
    distinct: Boolean = false) extends Serializable {
  require(0 < minN && minN <= maxN, s"bad n-gram range [$minN, $maxN]")

  def grams(s: UTF8String): ArrayData = {
    val str = s.toString
    val strLen = str.length
    val cpCount = str.codePointCount(0, strLen)
    // UTF-16 offset of each code point boundary, computed once
    val offs = new Array[Int](cpCount + 1)
    var o = 0
    var ci = 0
    while (ci < cpCount) {
      offs(ci) = o
      o = str.offsetByCodePoints(o, 1)
      ci += 1
    }
    offs(cpCount) = strLen
    var total = 0
    var n = minN
    while (n <= maxN) {
      if (cpCount >= n) total += cpCount - n + 1
      n += 1
    }
    if (!distinct) {
      val out = new Array[AnyRef](total)
      var w = 0
      n = minN
      while (n <= maxN) {
        var p = 0
        val last = cpCount - n
        while (p <= last) {
          out(w) = UTF8String.fromString(str.substring(offs(p), offs(p + n)))
          w += 1
          p += 1
        }
        n += 1
      }
      new GenericArrayData(out)
    } else {
      // r19 (the NB dfreq pass, guide §2.2 shuffle fewer bytes): emit
      // each gram ONCE, in first-occurrence order — element-for-element
      // what array_distinct over the full extraction returns (pinned by
      // ClassifierSpec's differential), without materializing the
      // duplicate majority as UTF8Strings first. The set keys on the
      // java String slice; only first occurrences pay the UTF8String
      // encode.
      val seen = new java.util.HashSet[String](math.max(16, total * 2))
      val buf = new java.util.ArrayList[AnyRef](math.min(total, 1 << 12))
      n = minN
      while (n <= maxN) {
        var p = 0
        val last = cpCount - n
        while (p <= last) {
          val g = str.substring(offs(p), offs(p + n))
          if (seen.add(g)) buf.add(UTF8String.fromString(g))
          p += 1
        }
        n += 1
      }
      new GenericArrayData(buf.toArray)
    }
  }
}

case class CharGramsExpr(child: Expression, holder: CharGramsHolder)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    holder.grams(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("chargrams", holder,
      "graft.text.CharGramsHolder")
    defineCodeGen(ctx, ev, c => s"$h.grams($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharGrams {
  def apply(c: Column, minN: Int, maxN: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      CharGramsExpr(org.apache.spark.sql.GraftBridge.expression(c),
        new CharGramsHolder(minN, maxN)))

  /** `array_distinct(CharGrams(c, minN, maxN))` fused into the same
    * single pass: identical elements, identical (first-occurrence)
    * order, no materialization of the duplicate grams.
    */
  def distinct(c: Column, minN: Int, maxN: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      CharGramsExpr(org.apache.spark.sql.GraftBridge.expression(c),
        new CharGramsHolder(minN, maxN, distinct = true)))
}
