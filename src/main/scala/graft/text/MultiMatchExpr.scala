package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Ships the needle list with the plan; the automaton itself is
  * `@transient lazy` — rebuilt once per JVM (driver or executor) on first
  * use, never serialized.
  */
final class AhoHolder(val needles: Array[String]) extends Serializable {
  // resolved through the JVM-global ByteDfa cache: this holder is
  // deserialized once PER TASK, so building here directly would rebuild
  // the automaton per task (the dominant cost of the whole filter at
  // 32 tasks — r18 DfaProbe measurement)
  @transient private lazy val dfa = ByteDfa.forNeedles(needles)
  // Locale.ROOT: default-locale toLowerCase diverges under tr-TR ('I' →
  // dotless 'ı'), which would stop ASCII needles like "ai" from matching.
  // Fully-ASCII haystacks (the common case) never lowercase at all: the
  // DFA scans UTF8String bytes in place with A–Z→a–z fused into the
  // transition — zero allocation per row. Non-ASCII haystacks must lower
  // through String — unicode case mapping can change byte length and even
  // produce ASCII (U+212A KELVIN SIGN → 'k'), which a byte map can't see.
  def containsAnyLower(s: UTF8String): Boolean =
    if (s.isFullAscii) dfa.containsBytes(s)
    else dfa.containsBytes(UTF8String.fromString(
      s.toString.toLowerCase(java.util.Locale.ROOT)))
  def countAllLower(s: UTF8String): Long =
    if (s.isFullAscii) dfa.countBytes(s)
    else dfa.countBytes(UTF8String.fromString(
      s.toString.toLowerCase(java.util.Locale.ROOT)))
}

/** Codegen'd Catalyst expressions for the multi-substring filters — unlike
  * a ScalaUDF these stay inside WholeStageCodegen: no encoder boxing, no
  * InternalRow↔Row conversion, null handling inherited from
  * `UnaryExpression`. Generated code calls straight into the holder added
  * as a codegen reference object.
  */
trait AhoExpr extends UnaryExpression {
  def holder: AhoHolder
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires string, got ${child.dataType}")
}

/** `lower(child) contains any needle` (check_ethics shape). */
case class ContainsAnyExpr(child: Expression, holder: AhoHolder)
    extends AhoExpr {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    holder.containsAnyLower(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("aho", holder, "graft.text.AhoHolder")
    defineCodeGen(ctx, ev, c => s"$h.containsAnyLower($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Σ non-overlapping needle occurrence counts in lower(child)
  * (check_nsfw_words shape).
  */
case class CountMatchesExpr(child: Expression, holder: AhoHolder)
    extends AhoExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    holder.countAllLower(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("aho", holder, "graft.text.AhoHolder")
    defineCodeGen(ctx, ev, c => s"$h.countAllLower($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MultiMatch {
  import org.apache.spark.sql.GraftBridge

  /** Column API: true iff lower(c) contains any of `needles`. */
  def containsAny(c: Column, needles: Array[String]): Column =
    GraftBridge.column(
      ContainsAnyExpr(GraftBridge.expression(c), new AhoHolder(needles)))

  /** Column API: Σ per-needle non-overlapping counts in lower(c). */
  def countMatches(c: Column, needles: Array[String]): Column =
    GraftBridge.column(
      CountMatchesExpr(GraftBridge.expression(c), new AhoHolder(needles)))
}
