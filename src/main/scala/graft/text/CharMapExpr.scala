package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-character map (1→1 and 1→many) as one codegen expression — the
  * exact shape of the reference's `normalize_whitespace` /
  * `normalize_punctuation` per-char dict loops (cleaners.py:16-19,60-63).
  * Spark's `translate` handles only 1→1 and takes a slow codepoint-dict
  * path for non-ASCII tables; this holder precomputes a minimum-char fast
  * path (plain ASCII below the smallest mapped char is appended verbatim)
  * and binary-searches a tiny sorted table otherwise.
  */
final class CharMapHolder(mapping: Seq[(Char, String)]) extends Serializable {
  // identity entries (e.g. the reference whitespace set's ' '→' ') are
  // semantic no-ops; dropping them keeps the untouched-string fast path
  // effective on plain-ASCII text
  private val sorted = mapping.filter { case (k, v) => v != k.toString }
    .sortBy(_._1).toArray
  private val keys: Array[Char] = sorted.map(_._1)
  private val vals: Array[String] = sorted.map(_._2)
  // all reference tables map nothing below this (0x20→' ' identity aside)
  private val minKey: Char = if (keys.isEmpty) Char.MaxValue else keys(0)
  // every reference table maps only non-ASCII chars, so a fully-ASCII
  // string (the common corpus row) can't contain a key: return it without
  // the UTF-16 round-trip or the per-char scan
  private val noAsciiKeys: Boolean = minKey >= 0x80

  def mapChars(s: UTF8String): UTF8String = {
    if (noAsciiKeys && s.isFullAscii) return s
    val str = s.toString
    var i = 0
    val n = str.length
    // fast scan: untouched prefix needs no builder at all
    while (i < n && (str.charAt(i) < minKey ||
      java.util.Arrays.binarySearch(keys, str.charAt(i)) < 0)) i += 1
    if (i == n) return s
    val sb = new java.lang.StringBuilder(n + 8)
    sb.append(str, 0, i)
    while (i < n) {
      val ch = str.charAt(i)
      if (ch < minKey) sb.append(ch)
      else {
        val idx = java.util.Arrays.binarySearch(keys, ch)
        if (idx < 0) sb.append(ch) else sb.append(vals(idx))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class CharMapExpr(child: Expression, holder: CharMapHolder)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    holder.mapChars(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("charmap", holder, "graft.text.CharMapHolder")
    defineCodeGen(ctx, ev, c => s"$h.mapChars($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharMap {
  def apply(c: Column, mapping: Seq[(Char, String)]): Column =
    org.apache.spark.sql.GraftBridge.column(
      CharMapExpr(org.apache.spark.sql.GraftBridge.expression(c),
        new CharMapHolder(mapping)))
}
