package graft.scoring

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** NB scoring for substring-countable featurizers in ONE Aho–Corasick
  * scan (r19): per row, the vocab grams' overlapping occurrence counts
  * (== gram term frequencies on valid UTF-8, see
  * [[graft.text.ByteDfa.countEachInto]]) are folded directly into the
  * per-label micro-nat sums — no gram array, no Seq[String] UDF
  * conversion, no per-gram hash lookups. The integer arithmetic is the
  * SAME sum [[NaiveBayes.predict]] computes, so label, score, and margin
  * are bit-identical (ClassifierSpec differential pins it).
  *
  * The automaton rides the JVM-global bounded [[graft.text.ByteDfa]]
  * cache (one build per executor, not per task); the weight matrix is a
  * plan-shipped holder like [[graft.text.AhoHolder]].
  */
final class NbScoreHolder(
    val labels: Array[String],
    val priors: Array[Long],
    val needles: Array[String],
    val weights: Array[Array[Long]]) extends Serializable {
  @transient private lazy val dfa = graft.text.ByteDfa.forNeedles(needles)
  @transient private lazy val labelUtf: Array[UTF8String] =
    labels.map(UTF8String.fromString)

  def score(s: UTF8String): InternalRow = {
    val counts = new Array[Long](needles.length)
    dfa.countEachInto(s, counts)
    val n = labels.length
    val sc = priors.clone()
    var i = 0
    while (i < counts.length) {
      val c = counts(i)
      if (c != 0L) {
        val w = weights(i)
        var l = 0
        while (l < n) { sc(l) += c * w(l); l += 1 }
      }
      i += 1
    }
    // argmax keeping the FIRST max — labels are stored ascending, so ties
    // prefer the lexicographically smallest (predict()'s exact loop)
    var bi = 0
    var l = 1
    while (l < n) { if (sc(l) > sc(bi)) bi = l; l += 1 }
    var second = Long.MinValue
    l = 0
    while (l < n) { if (l != bi && sc(l) > second) second = sc(l); l += 1 }
    InternalRow(labelUtf(bi), sc(bi), if (n <= 1) 0L else sc(bi) - second)
  }
}

/** Word-token NB scoring fused with the tokenizer (r19): one kernel
  * call tokenizes the text (the exact [[graft.text.GraftTextKernels
  * .wordTokens]] run-scan `predict`'s featurizer uses) and folds each
  * token's weight vector into the per-label sums via a UTF8String-keyed
  * map — no Catalyst token array, no Seq[String] UDF conversion, no
  * per-token String decode. Same integer sums as [[NaiveBayes.predict]]
  * with the default featurizer (ClassifierSpec differential).
  */
final class NbTokenScoreHolder(
    val labels: Array[String],
    val priors: Array[Long],
    tokens: Array[String],
    tokenWeights: Array[Array[Long]]) extends Serializable {
  @transient private lazy val weightMap = {
    val m = new java.util.HashMap[UTF8String, Array[Long]](
      tokens.length * 2)
    var i = 0
    while (i < tokens.length) {
      m.put(UTF8String.fromString(tokens(i)), tokenWeights(i))
      i += 1
    }
    m
  }
  @transient private lazy val labelUtf: Array[UTF8String] =
    labels.map(UTF8String.fromString)

  def score(s: UTF8String): InternalRow = {
    val toks = graft.text.GraftTextKernels.wordTokens(s)
    val n = labels.length
    val sc = priors.clone()
    var i = 0
    while (i < toks.length) {
      val w = weightMap.get(toks(i))
      if (w != null) {
        var l = 0
        while (l < n) { sc(l) += w(l); l += 1 }
      }
      i += 1
    }
    var bi = 0
    var l = 1
    while (l < n) { if (sc(l) > sc(bi)) bi = l; l += 1 }
    var second = Long.MinValue
    l = 0
    while (l < n) { if (l != bi && sc(l) > second) second = sc(l); l += 1 }
    InternalRow(labelUtf(bi), sc(bi), if (n <= 1) 0L else sc(bi) - second)
  }
}

case class NbTokenScoreExpr(child: Expression, holder: NbTokenScoreHolder)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("nb_label", StringType, nullable = false),
    StructField("nb_score_micro", LongType, nullable = false),
    StructField("nb_margin_micro", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    holder.score(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("nbTokScore", holder,
      "graft.scoring.NbTokenScoreHolder")
    defineCodeGen(ctx, ev, c => s"$h.score($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class NbScoreExpr(child: Expression, holder: NbScoreHolder)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("nb_label", StringType, nullable = false),
    StructField("nb_score_micro", LongType, nullable = false),
    StructField("nb_margin_micro", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    holder.score(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("nbScore", holder,
      "graft.scoring.NbScoreHolder")
    defineCodeGen(ctx, ev, c => s"$h.score($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
