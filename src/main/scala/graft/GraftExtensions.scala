package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.text._

/** SQL-surface registration for the engine's custom expressions, so a SQL
  * user gets the same operators as the Column API:
  *
  *   - `graft_strip(s)`              — Python-strip edge trim
  *   - `graft_char_map_ws(s)`        — normalize_whitespace char map
  *   - `graft_char_map_punct(s)`     — normalize_punctuation char map
  *   - `graft_contains_unwanted(s)`  — check_ethics phrase scan
  *   - `graft_contains_unwanted_harsh(s)`
  *   - `graft_nsfw_count(s)`         — non-overlapping NSFW needle count
  *
  * Use either `GraftFunctions.register(spark)` on an existing session or
  * `spark.sql.extensions=graft.GraftExtensions` at session build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.definitions.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          (exprs: Seq[Expression]) => builder(exprs)))
    }
    ext.injectOptimizerRule(_ => CollapseStripWs)
  }
}

/** Optimizer rule: `stripWs` is idempotent, and the flagship plan really
  * produces nested applications (R2 strips `response`, then cleaners strip
  * again after Catalyst collapses the projections) — rewrite
  * StripWs(StripWs(e)) → StripWs(e).
  */
object CollapseStripWs
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import graft.text.StripWsExpr
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case StripWsExpr(inner: StripWsExpr) =>
        // collapse the whole chain in one rewrite (transformDown does not
        // revisit the replacement node itself)
        var cur: StripWsExpr = inner
        while (cur.child.isInstanceOf[StripWsExpr])
          cur = cur.child.asInstanceOf[StripWsExpr]
        cur
    }
}

object GraftFunctions {

  private def one(exprs: Seq[Expression], name: String): Expression = {
    require(exprs.length == 1, s"$name takes exactly 1 argument")
    exprs.head
  }

  val definitions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_strip" ->
      ((es: Seq[Expression]) => StripWsExpr(one(es, "graft_strip"))),
    "graft_char_map_ws" ->
      ((es: Seq[Expression]) => CharMapExpr(one(es, "graft_char_map_ws"),
        new CharMapHolder(Cleaners.WhitespaceChars.map(_ -> " ")))),
    "graft_char_map_punct" ->
      ((es: Seq[Expression]) => CharMapExpr(one(es, "graft_char_map_punct"),
        new CharMapHolder(
          Cleaners.PunctOneToOne.map { case (k, v) => k -> v.toString } ++
            Cleaners.PunctOneToMany.map { case (k, v) => k.charAt(0) -> v }))),
    "graft_contains_unwanted" ->
      ((es: Seq[Expression]) => ContainsAnyExpr(
        one(es, "graft_contains_unwanted"),
        new AhoHolder(WordLists.UnwantedWords))),
    "graft_contains_unwanted_harsh" ->
      ((es: Seq[Expression]) => ContainsAnyExpr(
        one(es, "graft_contains_unwanted_harsh"),
        new AhoHolder(WordLists.HarshUnwantedWords))),
    "graft_nsfw_count" ->
      ((es: Seq[Expression]) => CountMatchesExpr(
        one(es, "graft_nsfw_count"), new AhoHolder(WordLists.NsfwWords))))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => builder(exprs))
    }
}
