package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline at scale: language
  * ID, quality scoring, token counting, document fingerprinting. All pure
  * `Column` expressions (codegen'd, no UDFs, no shuffles) — they run at
  * scan speed on 100 TB.
  */
object TextAnalysis {

  /** Non-overlapping substring occurrence count (replace-count identity —
    * same semantics as Python `str.count`).
    */
  def countOccurrences(c: Column, needle: String): Column =
    ((length(c) - length(replace(c, lit(needle), lit("")))) /
      needle.length).cast("long")

  /** Whitespace token count (Python `str.split()` semantics: empty → 0). */
  def tokenCountWhitespace(c: Column): Column = {
    val t = graft.text.Cleaners.stripWs(c)
    when(length(t) === 0, 0).otherwise(size(split(t, "\\s+")))
  }

  /** BPE-ish subword piece count: letter runs, single digits, and isolated
    * punctuation — a cheap, deterministic proxy for tokenizer cost.
    */
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  def wordCount(c: Column): Column = graft.text.Filters.wordCount(c)

  private val punctClass = "[.!?,;:]"

  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, punctClass, ""))

  val EnStopwords: Seq[String] = Seq(" the ", " and ", " is ", " of ", " to ")

  def stopwordCount(c: Column, stopwords: Seq[String] = EnStopwords): Column =
    stopwords.map(countOccurrences(c, _)).reduce(_ + _)

  /** Composite quality score in [0,1]: word-count saturation + inverse
    * punctuation density + stopword naturalness. The exact expression shape
    * is mirrored in the DuckDB oracle (bit-identical doubles).
    */
  def qualityScore(c: Column): Column = {
    val words = wordCount(c)
    val chars = length(c)
    val wq = least(words.cast("double") / 100.0, lit(1.0))
    val pr = punctCount(c).cast("double") /
      greatest(chars, lit(1)).cast("double")
    val sr = least(stopwordCount(c).cast("double") /
      greatest(words, lit(1)).cast("double") * 5.0, lit(1.0))
    lit(0.4) * wq + lit(0.3) * (lit(1.0) - pr) + lit(0.3) * sr
  }

  /** Language-ID stopword lexicons (substring-count heuristic — one
    * codegen'd pass, no model file).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " is "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " que "))

  /** N-gram-heuristic language ID with a fixed tie-break order
    * (en > de > fr > es).
    */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> markers.map(countOccurrences(c, _)).reduce(_ + _)
    }
    val Seq(en, de, fr, es) = scores.map(_._2)
    when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Document fingerprint: md5 of the case- and whitespace-normalized text.
    * Content-addressed exact-dup key usable as a bucketing/dedup column.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "\\s+", " ").cast("binary"))

  /** In-document line dedup (dolma-style repetition cleanup): drop every
    * line equal to an EARLIER line of the same document, preserving
    * order. Column-only: `array_position` returns the FIRST index of a
    * value, so a line survives iff its position is that first index.
    * O(lines²) per document by construction (fine: documents have tens of
    * lines; no shuffle, stays in the scan).
    */
  def dedupLines(c: Column): Column = {
    val arr = split(c, "\n")
    array_join(
      filter(arr, (x, i) => array_position(arr, x) === (i + 1).cast("long")),
      "\n")
  }
}
