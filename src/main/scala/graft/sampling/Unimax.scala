package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and More
  * Effective Language Sampling for Large-Scale Multilingual Pretraining")
  * — split a total token budget across languages so that every language
  * gets an equal share EXCEPT those whose entire corpus, repeated at most
  * `maxEpochs` times, is smaller than that share; they contribute
  * everything they have and the freed budget is re-shared among the rest.
  * This is the published fix for both temperature sampling's tail
  * over-repetition and proportional sampling's head domination: no
  * language is ever repeated beyond `maxEpochs`, and the budget that
  * low-resource languages cannot absorb flows to the others.
  *
  * The reference pipeline's `sample_datasets` (dataset_sampler.py) mixes
  * by static row weights; [[Mixture]] upgraded that to token budgets —
  * UniMax derives the budgets themselves from the corpus, closing the
  * mixture family: capacities → UniMax allocation → [[Mixture]] epoch
  * plan / greedy fill, all in one lazy plan.
  *
  * The sequential waterfill has a closed form: process languages in
  * ascending order of `cap = capacity × maxEpochs`. Once one language
  * does NOT bind its cap, the fair share is invariant from there on
  * (removing a language and its equal share leaves remaining/remaining
  * unchanged), so the binding set is a PREFIX of the cap-ascending
  * order: language j binds iff every language before it binds and
  * `cap_j × (n − j + 1) < B − Σ_{i<j} cap_i`. The prefix test, the
  * freed-budget share, and the deterministic remainder distribution are
  * all window arithmetic over the per-language aggregate.
  *
  * All-integer semantics (exactly replayable in SQL): the non-binding
  * languages receive `floor((B − Σ bound caps) / r)` tokens each and the
  * `mod r` remainder is handed out one token at a time from the LARGEST
  * cap down (they have the most headroom; a +1 can exceed a cap only on
  * an exact tie, by at most one token — documented, deterministic).
  * When the budget exceeds the total ceiling `Σ cap`, every language
  * binds and the surplus goes unspent (`allocation = cap` for all).
  *
  * Scale shape: ONE map-side-combined aggregation to #languages rows
  * (≤ a few hundred at 100 TB), windows over that tiny frame only —
  * the corpus is never shuffled, nothing is collected. The output is a
  * broadcast-sized budget frame that feeds [[Mixture.tokenBudgetSelectBy]]
  * / [[Mixture.tokenBudgetPlan]] unchanged.
  */
object Unimax {

  /** Per-language UniMax plan: (lang, capacity, cap, binding, allocation,
    * full_epochs, remainder_tokens) with `allocation = full_epochs ×
    * capacity + remainder_tokens`, `allocation ≤ cap` (+1 on an exact
    * remainder tie), and `Σ allocation = min(B, Σ cap)` up to the
    * documented tie overshoot.
    *
    * @param tokenCount per-row token count expression over `df`
    * @param budget     total token budget B to distribute
    * @param maxEpochs  hard repetition ceiling per language
    */
  def allocate(df: DataFrame, langCol: String, tokenCount: Column,
      budget: Long, maxEpochs: Int): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val caps = df.withColumn("_toks", tokenCount)
      .groupBy(langCol)
      .agg(sum("_toks").as("capacity"))
      .withColumn("cap", col("capacity") * maxEpochs)
    // Every window below runs over the #languages-row aggregate — one
    // task over driver-scale data, the Curriculum/Mixture-offsets shape.
    val asc = Window.orderBy(col("cap"), col(langCol))
    val prefix = asc.rowsBetween(Window.unboundedPreceding, -1)
    val n = count(lit(1)).over(
      asc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    val ranked = caps
      .withColumn("_j", row_number().over(asc))
      .withColumn("_n", n)
      .withColumn("_pfx", coalesce(sum(col("cap")).over(prefix), lit(0L)))
      // row-local bind test, assuming all before it bind...
      .withColumn("_ind",
        col("cap") * (col("_n") - col("_j") + 1) < lit(budget) - col("_pfx"))
      // ...made a prefix: binding iff no earlier row failed the test
      .withColumn("binding",
        coalesce(sum(when(col("_ind"), 0).otherwise(1)).over(
          asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(0L)) === 0)
    val desc = Window.orderBy(col("cap").desc, col(langCol).desc)
    val shared = ranked
      .withColumn("_bound_sum",
        coalesce(sum(when(col("binding"), col("cap"))).over(
          asc.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)), lit(0L)))
      .withColumn("_r", sum(when(col("binding"), 0).otherwise(1)).over(
        asc.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("_free", lit(budget) - col("_bound_sum"))
      // rank among the non-binding languages, largest cap first, for the
      // one-token remainder handout
      .withColumn("_rk_desc",
        sum(when(col("binding"), 0).otherwise(1)).over(
          desc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("allocation",
        when(col("binding"), col("cap")).otherwise(
          expr("_free div _r") +
            when(col("_rk_desc") <= col("_free") % col("_r"), 1L)
              .otherwise(0L)))
    shared.select(col(langCol), col("capacity"), col("cap"), col("binding"),
      col("allocation"),
      expr("allocation div capacity").as("full_epochs"),
      (col("allocation") % col("capacity")).as("remainder_tokens"))
  }

  /** The UniMax allocation as a (langCol, budget) frame ready for
    * [[Mixture.tokenBudgetSelectBy]] — derive budgets from the corpus,
    * then greedy-fill them, in one lazy plan.
    */
  def budgetFrame(df: DataFrame, langCol: String, tokenCount: Column,
      budget: Long, maxEpochs: Int): DataFrame =
    allocate(df, langCol, tokenCount, budget, maxEpochs)
      .select(col(langCol), col("allocation").as("budget"))

  /** End-to-end UniMax selection: allocate per-language budgets, then
    * fill each with [[Mixture.tokenBudgetSelectBy]]'s deterministic
    * md5-ordered greedy fill (full epochs are the caller's concern via
    * [[Mixture.materializeEpochs]]-style expansion; this returns the
    * first-epoch kept set for allocation ≤ capacity languages and the
    * whole corpus for languages binding at maxEpochs ≥ 1 full pass).
    */
  def select(df: DataFrame, idCol: String, langCol: String,
      tokenCount: Column, budget: Long, maxEpochs: Int,
      seed: Long): DataFrame =
    Mixture.tokenBudgetSelectBy(df, idCol, langCol, tokenCount,
      budgetFrame(df, langCol, tokenCount, budget, maxEpochs), seed)
}
