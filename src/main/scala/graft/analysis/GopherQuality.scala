package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, §A1.1 — the
  * standard pre-training quality gate; thresholds below are the published
  * ones). All signals are pure `Column` expressions over one scan — no
  * UDFs, no shuffle — and every signal is mirrored 1:1 in the DuckDB
  * oracle (`gopher_quality_signals`).
  *
  * Signals (word = `[\p{L}\p{N}_]+` token, shared with F1):
  *  - word_count ∈ [minWords, maxWords]        (50..100k)
  *  - mean_word_len ∈ [3, 10]
  *  - symbol_to_word_ratio ≤ 0.1               (# or ... vs words)
  *  - bullet_line_ratio ≤ 0.9                  (lines starting with a bullet)
  *  - ellipsis_line_ratio ≤ 0.3                (lines ending with ...)
  *  - alpha_word_ratio ≥ 0.8                   (words containing a letter)
  */
object GopherQuality {

  import graft.text.Filters.WordClassRegex

  private def words(c: Column): Column =
    graft.text.FusedText.wordTokens(c) // ≡ regexp_extract_all(lower(c), …)

  // the count-only kernel — no token array materialized
  def wordCount(c: Column): Column = graft.text.FusedText.wordCount(c)

  /** Mean word length over word tokens; 0.0 for wordless docs. */
  def meanWordLen(c: Column): Column = {
    val w = words(c)
    when(size(w) === 0, lit(0.0))
      .otherwise(
        aggregate(w, lit(0L), (acc, x) => acc + length(x)).cast("double") /
          size(w))
  }

  /** (# of '#' + '...') / words — Gopher's symbol ratio. */
  def symbolToWordRatio(c: Column): Column = {
    val hashes = length(c) - length(replace(c, lit("#"), lit("")))
    val ell = (length(c) - length(replace(c, lit("..."), lit("")))) / 3
    when(wordCount(c) === 0, lit(0.0))
      .otherwise((hashes + ell).cast("double") / wordCount(c))
  }

  private def lines(c: Column): Column = split(c, "\n")

  /** Fraction of lines starting with a bullet marker. */
  def bulletLineRatio(c: Column): Column = {
    val l = lines(c)
    val bullets = Seq("- ", "* ", "• ")
    size(filter(l, x => bullets
      .map(b => graft.text.Cleaners.stripWs(x).startsWith(b))
      .reduce(_ || _))).cast("double") / size(l)
  }

  /** Fraction of lines ending with an ellipsis. */
  def ellipsisLineRatio(c: Column): Column = {
    val l = lines(c)
    size(filter(l, x => graft.text.Cleaners.stripWs(x).endsWith("...") ||
      graft.text.Cleaners.stripWs(x).endsWith("…")))
      .cast("double") / size(l)
  }

  /** Fraction of word tokens containing at least one letter. */
  def alphaWordRatio(c: Column): Column = {
    val w = words(c)
    when(size(w) === 0, lit(0.0))
      .otherwise(size(filter(w, x => x.rlike("\\p{L}"))).cast("double") /
        size(w))
  }

  /** Gopher repetition signal: fraction of segments (lines by default,
    * paragraphs for `sep = "\n\n"`) that are duplicates of an earlier
    * segment.
    */
  def dupSegmentFraction(c: Column, sep: String = "\n"): Column = {
    val l = split(c, java.util.regex.Pattern.quote(sep))
    (size(l) - size(array_distinct(l))).cast("double") / size(l)
  }

  def dupLineFraction(c: Column): Column = dupSegmentFraction(c)

  def dupParagraphFraction(c: Column): Column =
    dupSegmentFraction(c, "\n\n")

  /** Fraction of characters inside duplicated segments (occurrences after
    * the first).
    */
  def dupSegmentCharFraction(c: Column, sep: String = "\n"): Column = {
    val l = split(c, java.util.regex.Pattern.quote(sep))
    val totalChars = aggregate(l, lit(0L), (acc, x) => acc + length(x))
    val dupSegs = filter(l,
      (x, i) => array_position(l, x) =!= (i + 1).cast("long"))
    val dupChars = aggregate(dupSegs, lit(0L), (acc, x) => acc + length(x))
    when(totalChars === 0, lit(0.0))
      .otherwise(dupChars.cast("double") / totalChars)
  }

  def dupLineCharFraction(c: Column): Column = dupSegmentCharFraction(c)

  def dupParagraphCharFraction(c: Column): Column =
    dupSegmentCharFraction(c, "\n\n")

  /** The published Gopher gate (incl. the repetition thresholds: dup
    * line/paragraph fraction ≤ 0.30, dup line/paragraph char fraction
    * ≤ 0.20).
    */
  def keep(c: Column,
      minWords: Int = 50, maxWords: Int = 100000): Column =
    wordCount(c).between(minWords, maxWords) &&
      meanWordLen(c).between(3.0, 10.0) &&
      symbolToWordRatio(c) <= 0.1 &&
      bulletLineRatio(c) <= 0.9 &&
      ellipsisLineRatio(c) <= 0.3 &&
      alphaWordRatio(c) >= 0.8 &&
      dupLineFraction(c) <= 0.3 &&
      dupLineCharFraction(c) <= 0.2 &&
      dupParagraphFraction(c) <= 0.3 &&
      dupParagraphCharFraction(c) <= 0.2
}
