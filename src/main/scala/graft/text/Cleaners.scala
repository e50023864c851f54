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
    * the documented high-value subset in ftfy's own pipeline order: HTML
    * entity unescape (auto heuristic) → terminal-escape removal →
    * sloppy-cp1252/latin-1↔utf-8 mojibake repair (ftfy's core heuristic,
    * up to 3 passes; sloppy = cp1252 plus the five C1 holes since r8)
    * → C1-control reinterpretation → latin ligatures → fullwidth
    * folding → quote uncurling → line-break unification → lone-surrogate
    * replacement → control-char removal → NFC + null → "".
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

/** ftfy-subset (ftfy 6 `fix_text` defaults, JVM re-implementation of the
  * steps that matter for chat corpora), applied in ftfy's pipeline order.
  * Pure JVM, deterministic, executor-side singleton.
  */
object FtfyLite extends Serializable {
  private val cp1252 = Charset.forName("windows-1252")
  private val latin1 = Charset.forName("ISO-8859-1")

  /** One byte-codec round-trip: re-encode through `cs`, strict-decode as
    * UTF-8; any unmappable char or invalid sequence aborts the attempt.
    */
  private def roundTrip(s: String, cs: Charset): Option[String] = {
    val enc = cs.newEncoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val bytes = enc.encode(java.nio.CharBuffer.wrap(s))
      utf8Strict(bytes).filter(_ != s)
    } catch { case _: Exception => None }
  }

  private def utf8Strict(bytes: java.nio.ByteBuffer): Option[String] = {
    val dec = Charset.forName("UTF-8").newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(bytes).toString)
    catch { case _: Exception => None }
  }

  /** ftfy's `sloppy-windows-1252` encode table: every cp1252-mappable
    * char to its cp1252 byte, PLUS the five cp1252 holes (U+0081 U+008D
    * U+008F U+0090 U+009D) to their own low byte — a sloppy decoder maps
    * those bytes straight to C1 codepoints, so its mojibake mixes
    * cp1252-mapped chars and hole controls in ONE string (e.g. a thumbs-up
    * emoji, F0 9F 91 8D, displays as "ðŸ‘" + U+008D).
    * Strict cp1252 cannot encode the hole char and latin-1 cannot encode
    * the cp1252-only chars, so only this table reverses it (VERDICT r7 #3).
    */
  private val SloppyCp1252Enc: Map[Char, Byte] = {
    val mapped = (0 to 255).flatMap { b =>
      val ch = new String(Array(b.toByte), cp1252)
      if (ch.charAt(0) != '�') Some(ch.charAt(0) -> b.toByte) else None
    }
    val holes = ""
      .map(c => c -> (c & 0xff).toByte)
    (mapped ++ holes).toMap
  }

  private def sloppyRoundTrip(s: String): Option[String] = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      SloppyCp1252Enc.get(s.charAt(i)) match {
        case Some(b) => bytes(i) = b
        case None => return None
      }
      i += 1
    }
    utf8Strict(java.nio.ByteBuffer.wrap(bytes)).filter(_ != s)
  }

  private def tryRepair(s: String): Option[String] = {
    // Only attempt when the string contains the telltale high-latin lead
    // bytes of UTF-8 seen through a 1-byte codec. Sloppy cp1252 first --
    // a strict superset of a plain-cp1252 round-trip (identical bytes for
    // every strict-encodable string), additionally repairing texts that
    // mix cp1252-only chars and hole controls in ONE string (ftfy's
    // sloppy-windows-1252, the last named C1 gap, VERDICT r7 #3) --
    // then latin-1, which covers mojibake carrying the OTHER raw C1
    // codepoints that cp1252 maps away ("\u00c3\u0081ngel" ->
    // "\u00c1ngel"; latin-1 bytes == codepoints).
    if (!s.exists(ch => ch >= '\u00c2' && ch <= '\u00f4')) return None
    sloppyRoundTrip(s).orElse(roundTrip(s, latin1))
  }

  /** ftfy `unescape_html="auto"`: only when the text has entity-looking
    * `&...;` runs and no raw markup `<` (then it is actual HTML whose
    * entities are intentional). Named basics + numeric forms.
    */
  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "middot" -> "·", "laquo" -> "«", "raquo" -> "»")
  private val EntityRe =
    java.util.regex.Pattern.compile("&(#x?[0-9a-fA-F]+|[a-zA-Z]+);")

  private def unescapeHtml(s: String): String = {
    if (s.indexOf('&') < 0 || s.indexOf('<') >= 0) return s
    val m = EntityRe.matcher(s)
    val sb = new java.lang.StringBuffer
    while (m.find()) {
      val body = m.group(1)
      val rep =
        if (body.startsWith("#x") || body.startsWith("#X"))
          try new String(Character.toChars(Integer.parseInt(body.drop(2), 16)))
          catch { case _: Exception => m.group(0) }
        else if (body.startsWith("#"))
          try new String(Character.toChars(Integer.parseInt(body.drop(1))))
          catch { case _: Exception => m.group(0) }
        else NamedEntities.getOrElse(body, m.group(0))
      m.appendReplacement(sb,
        java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  private val TerminalEscapeRe =
    java.util.regex.Pattern.compile("\\u001B\\[[0-9;?]*[a-zA-Z]")

  /** ftfy `fix_c1_controls`: stray C1 codepoints (U+0080-U+009F) are
    * almost always cp1252 bytes read as latin-1 — reinterpret the mapped
    * ones (\x85→…, \x91→', \x93→" …); the five cp1252 holes stay.
    */
  private def fixC1Controls(s: String): String = {
    if (!s.exists(c => c >= '\u0080' && c <= '\u009F')) return s
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach { c =>
      if (c >= '\u0080' && c <= '\u009F') {
        val decoded = new String(Array((c & 0xff).toByte), cp1252)
        sb.append(if (decoded.charAt(0) == '�') c else decoded.charAt(0))
      } else sb.append(c)
    }
    sb.toString
  }

  private val Ligatures = Map(
    'Ĳ' -> "IJ", 'ĳ' -> "ij", 'ﬀ' -> "ff", 'ﬁ' -> "fi", 'ﬂ' -> "fl",
    'ﬃ' -> "ffi", 'ﬄ' -> "ffl", 'ﬅ' -> "st", 'ﬆ' -> "st")

  private val CurlyQuotes = Map(
    '‘' -> '\'', '’' -> '\'', '“' -> '"', '”' -> '"')

  private def mapChars(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach { c =>
      Ligatures.get(c) match {
        case Some(r) => sb.append(r)
        case None =>
          CurlyQuotes.get(c) match {
            case Some(q) => sb.append(q)
            // fullwidth forms → ASCII; ideographic space → space
            case None if c >= '！' && c <= '～' =>
              sb.append((c - 0xfee0).toChar)
            case None if c == '　' => sb.append(' ')
            case None => sb.append(c)
          }
      }
    }
    sb.toString
  }

  /** \r\n, \r, NEL, LS, PS → \n (ftfy `fix_line_breaks`). */
  private def fixLineBreaks(s: String): String =
    s.replace("\r\n", "\n").map {
      case '\r' | '\u0085' | '\u2028' | '\u2029' => '\n'
      case c => c
    }

  private def fixSurrogatesAndControls(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))) {
          sb.append(c).append(s.charAt(i + 1)); i += 1
        } else sb.append('�') // lone high surrogate
      } else if (Character.isLowSurrogate(c)) sb.append('�')
      else if (c < ' ' && c != '\t' && c != '\n' && c != '\f' && c != '\r') ()
      else if (c == '\u007F') () // DEL is Cc too
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  def fix(s: String): String = {
    if (s == null) return ""
    var cur = unescapeHtml(s)
    cur = TerminalEscapeRe.matcher(cur).replaceAll("")
    var i = 0
    // ftfy also iterates: doubly-encoded text needs several passes.
    while (i < 3) {
      tryRepair(cur) match {
        case Some(next) => cur = next; i += 1
        case None => i = 3
      }
    }
    cur = fixC1Controls(cur)
    cur = mapChars(cur)
    cur = fixLineBreaks(cur)
    cur = fixSurrogatesAndControls(cur)
    Normalizer.normalize(cur, Normalizer.Form.NFC)
  }
}
