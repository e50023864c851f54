package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics for pretraining-data triage: the
  * frequent-n-gram report (boilerplate detection: navigation chrome,
  * license headers, and template text surface as heavy hitters long
  * before any dedup runs) and per-document TF-IDF keyword extraction.
  *
  * Everything is `Column`-only (split/transform/explode — codegen'd, no
  * UDFs). The n-gram count is a hash aggregate with map-side partial
  * combine, so the shuffle carries one (gram, partial-count) row per
  * distinct gram per partition — skew in gram frequency flattens
  * map-side; the top-k is a `TakeOrdered`, never a global sort.
  */
object TermStats {

  /** Lowercased word tokens (the `[^a-z0-9_]+` splitter every text-
    * analysis query in this repo shares). r19: fused one-pass kernel —
    * the composed split+filter ran the ArrayFilter HOF interpreted per
    * row; [[wordsComposed]] is retained as the differential-spec
    * reference (AsciiGramsSpec pins element identity, unicode lowering
    * edge cases included).
    */
  def words(text: Column): Column = graft.text.AsciiGrams.tokens(text)

  /** The pre-r19 composed form of [[words]] — spec reference only. */
  private[graft] def wordsComposed(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9_]+"), w => length(w) > 0)

  /** All word n-grams WITH multiplicity (space-joined), [] below n words
    * — unlike `NgramJaccard.ngramsFromWords`, which dedups for set math.
    *
    * `wordsCol` MUST be a materialized column (an attribute), not the
    * `words(...)` expression inline: `element_at` inside the `transform`
    * lambda evaluates its child per element, so an inline split+filter
    * would re-tokenize the document 3× per gram (measured 38 s vs 1.4 s
    * on the sf0.1 heavy-hitter query). HOFs are CodegenFallback — no
    * common-subexpression elimination saves you.
    */
  def ngramsWithMultiplicity(wordsCol: Column, n: Int): Column =
    when(size(wordsCol) >= n,
      transform(sequence(lit(0), size(wordsCol) - n),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(wordsCol, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Top-`k` most frequent word `n`-grams across the corpus, ties broken
    * lexicographically: (gram, n_occurrences).
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    // r19: fused tokenize+gram kernel (one scan, no interpreted HOFs)
    df.select(explode(
        graft.text.AsciiGrams.ngrams(col(textCol), n)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(k)

  /** Per-document top-`k` salient terms with their TF-IDF ingredients:
    * (idCol, term, tf, df) where `tf` is the term's count within the
    * document and `df` the number of documents containing it. Ranking is
    * the INTEGER order (tf desc, df asc, term asc) — same "frequent here,
    * rare elsewhere" salience as tf·ln(N/df) without comparing floating
    * logs across engines (any idf flavor is a caller-side expression over
    * the surfaced tf/df; ln results differ by ulps between libms, which
    * would make a float rank nondeterministic cross-engine).
    *
    * Shuffle shape: one aggregate on (doc, term); document frequency is
    * a window over the term partition of the ALREADY-aggregated frame
    * (one row per (doc, term) — no re-explosion), rank a window over the
    * doc partition.
    */
  def tfIdfTop(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = df
      .select(col(idCol), explode(words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    val rank = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    withDf.withColumn("__rk__", row_number().over(rank))
      .where(col("__rk__") <= k)
      .drop("__rk__")
  }
}
