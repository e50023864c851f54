package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** HTML text extraction — the step BEFORE the C4/Gopher filters in a
  * real crawl pipeline (WARC response records carry markup, not prose).
  * A single-pass state machine, no DOM and no libraries, with PINNED
  * semantics so expected outputs are computable without parsing (the
  * construction-inverting oracle pattern):
  *
  *   - `<script>`/`<style>` elements drop whole (case-insensitive,
  *     attributes allowed on the open tag; an unclosed one drops the
  *     rest of the document — their content is code, never prose),
  *   - `<!-- comments -->` drop whole (unclosed → rest of document),
  *   - every other tag is removed; BLOCK tags (p div br li tr h1..h6,
  *     open or close, any attributes) additionally emit a newline —
  *     inline tags (b, i, a, span, …) must not split words,
  *   - a minimal entity set decodes: amp lt gt quot #39 nbsp
  *     (nbsp → plain space; unknown entities pass through verbatim),
  *   - whitespace normalizes: runs of spaces/tabs collapse to one
  *     space, lines trim, empty lines drop, lines join with \n.
  *
  * Scale shape: per-row O(len) scalar kernel — zero shuffles, composes
  * directly with [[graft.sources.Warc]] record payloads upstream and
  * [[graft.analysis.C4Filters]] downstream.
  */
object Html {

  private val BlockTags = Set("p", "div", "br", "li", "tr",
    "h1", "h2", "h3", "h4", "h5", "h6")

  private val Entities = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "#39" -> "'", "nbsp" -> " ")

  /** Tag name = leading [a-zA-Z0-9]+ after an optional '/'. */
  private def tagName(body: String): (String, Boolean) = {
    val close = body.startsWith("/")
    val s = if (close) body.substring(1) else body
    var i = 0
    while (i < s.length && (s(i).isLetterOrDigit)) i += 1
    (s.substring(0, i).toLowerCase(java.util.Locale.ROOT), close)
  }

  def extractText(html: String): String = {
    if (html == null) return ""
    val out = new java.lang.StringBuilder
    val n = html.length
    var i = 0
    var dropUntil: String = null // lowercase "</script" / "</style"
    while (i < n) {
      val c = html.charAt(i)
      if (dropUntil != null) {
        if (c == '<' && i + dropUntil.length <= n &&
            html.regionMatches(true, i, dropUntil, 0, dropUntil.length)) {
          val gt = html.indexOf('>', i)
          i = if (gt < 0) n else gt + 1
          dropUntil = null
        } else i += 1
      } else if (c == '<') {
        if (html.regionMatches(false, i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val gt = html.indexOf('>', i)
          val body = if (gt < 0) html.substring(i + 1)
            else html.substring(i + 1, gt)
          val (name, close) = tagName(body)
          if (!close && (name == "script" || name == "style"))
            dropUntil = "</" + name
          if (BlockTags.contains(name)) out.append('\n')
          i = if (gt < 0) n else gt + 1
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i)
        val ent = if (semi > i && semi - i <= 6)
          Entities.get(html.substring(i + 1, semi)) else None
        ent match {
          case Some(rep) => out.append(rep); i = semi + 1
          case None => out.append(c); i += 1
        }
      } else {
        out.append(c)
        i += 1
      }
    }
    // whitespace normalization: collapse space/tab runs, trim lines,
    // drop empties, join with \n
    out.toString.split("\n", -1).iterator
      .map(_.replaceAll("[ \\t\\u000B\\f\\r]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  val extractUdf: Column => Column = {
    val u = udf { (s: String) => extractText(s) }
    c => u(c)
  }
}
