package graft.text

import java.nio.charset.{Charset, CodingErrorAction}
import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string cleaners — projection surface of the reference
  * (`chat_data_pipeline/cleaners.py`). Each cleaner is a pure
  * `Column => Column` so Catalyst can fold, prune, and codegen them; only
  * `fix_utf8_encoding` needs a UDF (no JVM ftfy — documented subset).
  */
object Cleaners {

  /** Exact codepoint set of `cleaners.py:13` (0x20 maps to itself; the set's
    * visually-empty member is U+0084). 1:1 char map → `translate`.
    */
  val WhitespaceChars: String =
    "        　￼"

  /** `normalize_whitespace` — cleaners.py:16-19. CharMap expression: the
    * table is non-ASCII, where builtin `translate` leaves the fast path.
    */
  val normalizeWhitespace: Column => Column =
    c => CharMap(c, WhitespaceChars.map(_ -> " "))

  /** 1:1 entries of `unicode_punctuation` (cleaners.py:22-57). */
  val PunctOneToOne: Seq[(Char, Char)] = Seq(
    '，' -> ',', '。' -> '.', '、' -> ',', '„' -> '"',
    '”' -> '"', '“' -> '"', '«' -> '"', '»' -> '"',
    '１' -> '"', '」' -> '"', '「' -> '"', '《' -> '"',
    '》' -> '"', '´' -> '\'', '∶' -> ':', '：' -> ':',
    '？' -> '?', '！' -> '!', '（' -> '(', '）' -> ')',
    '；' -> ';', '–' -> '-', '～' -> '~', '’' -> '\'',
    '━' -> '-', '〈' -> '<', '〉' -> '>', '【' -> '[',
    '】' -> ']', '％' -> '%', '►' -> '-'
  )

  /** 1:many entries (em-dash, fullwidth stop, ellipsis — cleaners.py:45,46,49).
    * Sources are disjoint from `PunctOneToOne` keys and targets are plain
    * ASCII, so application order does not matter.
    */
  val PunctOneToMany: Seq[(String, String)] =
    Seq("—" -> " - ", "．" -> ". ", "…" -> "...")

  /** `normalize_punctuation` — cleaners.py:60-63: ONE per-char map pass
    * covering both the 1→1 and 1→many entries, exactly like the
    * reference's dict comprehension.
    */
  val normalizePunctuation: Column => Column = c =>
    CharMap(c, PunctOneToOne.map { case (k, v) => k -> v.toString } ++
      PunctOneToMany.map { case (k, v) => k.charAt(0) -> v })

  /** Python-`splitlines` boundary regex (Java flavor): \r\n as ONE
    * boundary, then each single-char boundary of str.splitlines —
    * \n \v \f \r \x1c \x1d \x1e \x85 U+2028 U+2029. The DuckDB mirror is
    * [[graft.OracleSql.SplitlinesRegexSql]] — keep in lock-step.
    */
  val LineBoundaryRegex: String =
    "\r\n|[\n\u000B\f\r\u001C-\u001E\u0085\u2028\u2029]"

  /** `remove_empty_lines` — cleaners.py:66-73, implementing the INTENDED
    * semantics: drop lines matching `^\s*$`, re-join with \n. The reference
    * has an inverted isinstance check (cleaners.py:71-72) that makes it
    * always return "" — we implement the intent and pin the divergence in
    * tests. Line boundaries: the full Python `splitlines` set. Blank-line
    * detection is ASCII `\s` = [ \t\n\x0b\f\r] — NOTE the bundled-DuckDB
    * RE2 `\s` does NOT match \x0b, so the oracle mirror spells the class
    * out ([[graft.OracleSql.WsClass]]); Python `str.strip` additionally
    * treats U+00A0 etc. as blank — documented divergence.
    */
  val removeEmptyLines: Column => Column = c =>
    array_join(
      filter(split(c, LineBoundaryRegex), l => !(l rlike "^\\s*$")),
      "\n")

  /** `clean_new_lines` — cleaners.py:76-79: strip, then delete all \n.
    * Python `strip()` removes all whitespace (not just spaces like SQL
    * `trim`), hence the custom edge trim; literal (non-regex) replace for
    * the newline removal.
    */
  val cleanNewLines: Column => Column = c =>
    replace(stripWs(c), lit("\n"), lit(""))

  /** Python-`strip()`-alike: trim ASCII whitespace from both ends —
    * codegen'd byte-scan expression, ≡ `regexp_replace(c,"^\\s+|\\s+$","")`.
    */
  def stripWs(c: Column): Column = StripWs(c)

  /** `fix_utf8_encoding` — cleaners.py:5-8. ftfy has no JVM port; this is
    * the documented high-value subset: cp1252/latin-1↔utf-8 mojibake repair
    * (ftfy's core heuristic) + NFC normalization + null → "".
    */
  val fixUtf8Encoding: Column => Column = { c =>
    val u = udf { (s: String) => FtfyLite.fix(s) }
    u(c)
  }

  /** Registry by reference name (utils.py:23-33 getattr resolution). */
  val registry: Map[String, Column => Column] = Map(
    "fix_utf8_encoding" -> fixUtf8Encoding,
    "normalize_whitespace" -> normalizeWhitespace,
    "normalize_punctuation" -> normalizePunctuation,
    "remove_empty_lines" -> removeEmptyLines,
    "clean_new_lines" -> cleanNewLines
  )
}

/** Minimal ftfy-subset: repair text that was decoded as cp1252 (or latin-1)
  * when it was actually UTF-8 (classic "Ã©"-style mojibake), then NFC-
  * normalize. Pure JVM, deterministic, executor-side singleton.
  */
object FtfyLite extends Serializable {
  private val cp1252 = Charset.forName("windows-1252")

  private def tryRepair(s: String): Option[String] = {
    // Only attempt when the string contains the telltale high-latin lead
    // bytes of UTF-8 seen through a 1-byte codec.
    if (!s.exists(ch => ch >= 'Â' && ch <= 'ô')) return None
    val enc = cp1252.newEncoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val dec = Charset.forName("UTF-8").newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val bytes = enc.encode(java.nio.CharBuffer.wrap(s))
      val out = dec.decode(bytes).toString
      if (out != s) Some(out) else None
    } catch { case _: Exception => None }
  }

  def fix(s: String): String = {
    if (s == null) return ""
    var cur = s
    var i = 0
    // ftfy also iterates: doubly-encoded text needs several passes.
    while (i < 3) {
      tryRepair(cur) match {
        case Some(next) => cur = next; i += 1
        case None => i = 3
      }
    }
    Normalizer.normalize(cur, Normalizer.Form.NFC)
  }
}
