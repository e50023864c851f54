package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget mixture construction — the "data mixing" stage of a
  * training run (LLaMA / Dolma style): each source is assigned a token
  * budget from the target mixture weights, a source whose budget exceeds
  * its mass is repeated for `full_epochs` passes, and the fractional
  * remainder is filled by a deterministic subset of its documents.
  *
  * The reference pipeline's closest op is `sample_datasets`
  * (dataset_sampler.py) which mixes by ROW counts; real training mixes
  * budget TOKENS — row sampling over-weights short-document sources.
  *
  * Scale shape: the plan is one map-side-combined aggregation over
  * (source); the remainder selection is ONE shuffle — hash-partition by
  * source, sort by the seeded md5 permutation key within partitions (the
  * same engine-independent key as R4 shuffle_seeded, so the selection is
  * reproducible on any cluster and replayable in ANSI SQL). Nothing is
  * collected; budgets are a broadcast frame.
  */
object Mixture {

  private def budgetDf(df: DataFrame, sourceCol: String,
      budgets: Map[String, Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    budgets.toSeq.sortBy(_._1).toDF(sourceCol, "budget")
  }

  /** Per-source epoch plan: (source, n_docs, total_tokens, budget,
    * full_epochs, remainder_tokens) with `budget = full_epochs *
    * total_tokens + remainder_tokens` — all integer arithmetic. Sources
    * without a budget entry are dropped (they are not in the mixture).
    */
  def tokenBudgetPlan(df: DataFrame, sourceCol: String, tokenCount: Column,
      budgets: Map[String, Long]): DataFrame =
    df.withColumn("_toks", tokenCount)
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"), sum("_toks").as("total_tokens"))
      .join(broadcast(budgetDf(df, sourceCol, budgets)), Seq(sourceCol))
      .select(col(sourceCol), col("n_docs"), col("total_tokens"),
        col("budget"),
        expr("budget div total_tokens").as("full_epochs"),
        (col("budget") % col("total_tokens")).as("remainder_tokens"))

  /** Deterministic greedy fill of each source's budget: documents in
    * seeded-md5 order, kept while the running token total stays within
    * budget (a source whose budget exceeds its mass keeps every row).
    * Adds `_toks` as `toks` and the running `cum_tokens`.
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, sourceCol: String,
      tokenCount: Column, budgets: Map[String, Long], seed: Long): DataFrame = {
    val key = md5(concat(lit(s"$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(sourceCol).orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("toks", tokenCount)
      .join(broadcast(budgetDf(df, sourceCol, budgets)), Seq(sourceCol))
      .withColumn("cum_tokens", sum(col("toks")).over(w))
      .where(col("cum_tokens") <= col("budget"))
      .drop("budget")
  }
}
