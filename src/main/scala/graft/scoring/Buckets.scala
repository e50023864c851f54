package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** cc_net-style corpus bucketing (Wenzek et al. 2020: split a crawl into
  * head/middle/tail by language-model perplexity terciles; the reference
  * consumes such buckets via its kenlm scorer).
  *
  * Two shapes:
  *  - [[rankBuckets]] — EXACT rank terciles via `ntile` over a global
  *    (score, id) order. Deterministic and SQL-mirrorable (the oracle
  *    hash-checks it), but the global window is a single-partition sort —
  *    fine for validation corpora, wrong at 100 TB.
  *  - [[cutoffBuckets]] — the scale path: score cutoffs estimated once
  *    with `approxQuantile` (driver holds k doubles), then one narrow
  *    codegen'd `when` chain over the scan. No global sort, no shuffle;
  *    bucket boundaries are approximate exactly like cc_net's published
  *    pipeline (it too trains cutoffs on a sample).
  */
object Buckets {

  val DefaultNames: Seq[String] = Seq("head", "middle", "tail")

  /** Exact rank-based buckets: ntile(n) over (score asc, id asc). */
  def rankBuckets(df: DataFrame, score: Column, id: Column,
      names: Seq[String] = DefaultNames,
      bucketCol: String = "bucket"): DataFrame = {
    val w = Window.orderBy(score.asc, id.asc)
    df.withColumn(bucketCol,
      element_at(array(names.map(lit): _*), ntile(names.length).over(w)))
  }

  /** Scale path: bucket by fixed score cutoffs (ascending). */
  def cutoffBuckets(df: DataFrame, score: Column, cutoffs: Seq[Double],
      names: Seq[String] = DefaultNames,
      bucketCol: String = "bucket"): DataFrame = {
    require(cutoffs.length == names.length - 1, "need n-1 cutoffs")
    val expr = cutoffs.zip(names.init).foldRight(lit(names.last)) {
      case ((cut, name), rest) => when(score <= cut, name).otherwise(rest)
    }
    df.withColumn(bucketCol, expr)
  }

  /** Estimate quantile cutoffs for [[cutoffBuckets]] — one
    * `approxQuantile` pass, driver holds n-1 doubles.
    */
  def quantileCutoffs(df: DataFrame, scoreCol: String, n: Int,
      relativeError: Double = 0.001): Seq[Double] =
    df.stat.approxQuantile(scoreCol,
      (1 until n).map(_.toDouble / n).toArray, relativeError).toSeq

  /** The cc_net composition: per-document LM perplexity (the shipped
    * ArpaScorer by default) → head/middle/tail.
    *
    * `scorer` is pluggable (r16): pass
    * `Perplexity.filterWith(lmPath, piecesPath, 0, 1e9).score` to bucket
    * with a USER-SUPPLIED KenLM-style ARPA + SentencePiece pair — the
    * composition cc_net itself publishes (Wenzek et al. train cutoffs
    * with exactly such a model).
    *
    * The approximate path runs TWO passes over the scores (quantile
    * estimate, then the bucketing scan), so the scored frame is persisted
    * — the LM scoring UDF is by far the most expensive expression here
    * and must not evaluate twice. The cache is dropped by Spark's
    * ContextCleaner once the returned plan is unreachable; callers that
    * bucket a 100 TB corpus should instead score once, PUBLISH the scored
    * column, and feed [[cutoffBuckets]] precomputed cutoffs.
    */
  def ccnetBuckets(df: DataFrame, textCol: String, idCol: String,
      exact: Boolean = false,
      scorer: Column => Column =
        c => graft.scoring.Perplexity.filter().score(c)): DataFrame = {
    val scored = df.withColumn("__ppl__", scorer(col(textCol)))
    val out =
      if (exact) rankBuckets(scored, col("__ppl__"), col(idCol))
      else {
        val cached = scored.persist()
        val cuts = quantileCutoffs(cached, "__ppl__", DefaultNames.length)
        cutoffBuckets(cached, col("__ppl__"), cuts)
      }
    out.drop("__ppl__")
  }
}
