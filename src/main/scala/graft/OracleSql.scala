package graft

import graft.text.{Cleaners, WordLists}

/** Shared DuckDB-SQL fragment generators for oracle queries. Each mirrors
  * one Spark-side operator EXACTLY (same char tables, same regexes, same
  * arithmetic) so that composite oracles (flagship E2E, F5) stay in sync
  * with the single-operator oracles when an operator's semantics change.
  */
object OracleSql {

  /** Escape a string for a single-quoted DuckDB literal. */
  def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** ASCII-whitespace class, spelled out: bundled-DuckDB RE2 `\s` does NOT
    * match `\x0b` (vertical tab), while the Spark-side [[Cleaners.stripWs]]
    * trims the full 0x09-0x0D + space range — an explicit class keeps both
    * engines identical on every input.
    */
  val WsClass: String = "[ \\t\\n\\x0b\\f\\r]"

  /** Python-`strip()` mirror of [[Cleaners.stripWs]]. */
  def strip(e: String): String =
    s"regexp_replace($e, '^$WsClass+|$WsClass+$$', '', 'g')"

  /** `get_words` count mirror of [[graft.text.Filters.wordCount]] —
    * unicode word class, spelled out identically on both engines.
    */
  def wordCount(e: String): String =
    s"len(regexp_extract_all(lower($e), '[\\p{L}\\p{N}_]+'))"

  /** C2 normalize_whitespace: same char table as the Spark CharMap. */
  def normalizeWhitespace(e: String): String = {
    val ws = Cleaners.WhitespaceChars
    val from = ws.map(_.toInt).map(i => s"chr($i)").mkString("||")
    s"translate($e, $from, repeat(' ', ${ws.length}))"
  }

  /** C3 normalize_punctuation: translate for 1:1 + replace for 1:many. */
  def normalizePunctuation(e: String): String = {
    val from = Cleaners.PunctOneToOne.map(_._1).mkString
    val to = Cleaners.PunctOneToOne.map(_._2).mkString
    Cleaners.PunctOneToMany.foldLeft(
      s"translate($e, ${q(from)}, ${q(to)})") {
      case (acc, (f, t)) => s"replace($acc, ${q(f)}, ${q(t)})"
    }
  }

  /** Python-`splitlines` boundary regex (C4), RE2 flavor. Must stay in
    * lock-step with [[Cleaners.LineBoundaryRegex]] (Java flavor).
    */
  val SplitlinesRegexSql: String =
    "\\r\\n|[\\n\\x0b\\f\\r\\x1c-\\x1e\\x{85}\\x{2028}\\x{2029}]"

  /** C4 remove_empty_lines: split on line boundaries, drop blank lines,
    * re-join with \n.
    */
  def removeEmptyLines(e: String): String =
    s"array_to_string(list_filter(regexp_split_to_array($e, " +
      s"'$SplitlinesRegexSql'), x -> NOT regexp_matches(x, " +
      s"'^$WsClass*$$')), chr(10))"

  /** F4 lowercase-ratio score (empty → 0.0). */
  def lowercaseRatio(e: String): String =
    s"CASE WHEN length($e)=0 THEN 0.0 ELSE " +
      s"CAST(length(regexp_replace($e, '[^a-z]', '', 'g')) AS DOUBLE)" +
      s"/length($e) END"

  /** F7 completion predicate: last char of the stripped doc is terminal
    * punctuation (same list as [[WordLists.CompletionPunctuations]]).
    */
  def completionKeep(e: String): String =
    s"${strip(e)}[-1:] IN (" +
      WordLists.CompletionPunctuations.map(q).mkString(", ") + ")"

  /** F5 char-repetition ratio as a CTE chain (utils.py:310-339 semantics:
    * frequency of all length-`n` char ngrams; ratio = mass of the
    * top-⌊√distinct⌋ (capped at distinct − singletons) over total mass).
    *
    * Codepoint-indexed on both engines: DuckDB `length`/`substr` count
    * Unicode codepoints and the Spark-side CharRepetition UDF iterates
    * codepoints too, so ngram windows agree on astral-plane characters
    * (emoji, surrogate pairs) — pinned by the emoji golden vector.
    *
    * Consumes a CTE named `src` exposing key columns `keys` plus a text
    * column `textCol`; emits CTEs ending in `__cr_ratio(keys..., ratio)`.
    * Rows whose text is shorter than `n` produce NO `__cr_ratio` row —
    * consumers LEFT JOIN and `coalesce(ratio, 0.0)`.
    */
  def charRepetitionCtes(src: String, keys: Seq[String], textCol: String,
      n: Int): String = {
    val k = keys.mkString(", ")
    s"__cr_grams AS (SELECT $k, unnest(list_transform(range(1, " +
      s"length($textCol)-${n - 2}), __p -> substr($textCol, __p, $n))) AS g " +
      s"FROM $src WHERE length($textCol) >= $n), " +
      s"__cr_freq AS (SELECT $k, g, count(*) AS c FROM __cr_grams " +
      s"GROUP BY $k, g), " +
      s"__cr_stats AS (SELECT $k, count(*) AS dn, CAST(sum(c) AS BIGINT) " +
      s"AS total, CAST(sum(CASE WHEN c=1 THEN 1 ELSE 0 END) AS BIGINT) " +
      s"AS ones FROM __cr_freq GROUP BY $k), " +
      s"__cr_ranked AS (SELECT $k, c, row_number() OVER (PARTITION BY $k " +
      s"ORDER BY c DESC) AS rk FROM __cr_freq), " +
      s"__cr_top AS (SELECT ${keys.map("r." + _).mkString(", ")}, " +
      s"CAST(sum(r.c) AS BIGINT) AS ts FROM __cr_ranked r JOIN __cr_stats " +
      s"s USING ($k) WHERE r.rk <= least(CAST(floor(sqrt(s.dn)) AS " +
      s"BIGINT), s.dn - s.ones) GROUP BY ${keys.map("r." + _).mkString(", ")}), " +
      s"__cr_ratio AS (SELECT ${keys.map("s." + _).mkString(", ")}, " +
      s"CAST(coalesce(t.ts, 0) AS DOUBLE)/s.total AS ratio FROM " +
      s"__cr_stats s LEFT JOIN __cr_top t USING ($k))"
  }
}
