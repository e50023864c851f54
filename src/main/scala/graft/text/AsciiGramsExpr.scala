package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The `[^a-z0-9_]+` text-analysis tokenizer and its word n-grams as ONE
  * codegen kernel (r19, guide §4). The composed form —
  * `filter(split(lower(text), "[^a-z0-9_]+"), w => length(w) > 0)` and
  * `transform(sequence(...), i => concat_ws(" ", element_at(...) ...))`
  * on top — runs the HOFs interpreted (ArrayFilter/ArrayTransform are
  * CodegenFallback) and materializes the full token array, a sequence
  * array, and per-gram element_at chains. One kernel call replaces the
  * chain; output is ELEMENT-IDENTICAL (AsciiGramsSpec differentials).
  *
  * Exactness notes, mirroring [[GraftTextKernels.wordTokens]]:
  *  - fully-ASCII input: single byte scan, `A-Z` lowered inline —
  *    byte-equal to `lower()` on ASCII.
  *  - otherwise: `UTF8String.toLowerCase` FIRST (the same call Spark's
  *    `lower()` makes — unicode-exact, e.g. Kelvin K → k, İ → i +
  *    combining dot), then the byte scan: every multi-byte codepoint's
  *    bytes are ≥ 0x80, i.e. outside `[a-z0-9_]`, so byte-level
  *    separator runs coincide with the regex's codepoint-level runs.
  *  - `distinct = true` ≡ `array_distinct(...)` (first-occurrence
  *    order) fused in — the Decon doc-gram shape.
  */
object AsciiGrams {

  @inline private def classByte(b: Byte): Boolean =
    (b >= 'a'.toByte && b <= 'z'.toByte) ||
    (b >= '0'.toByte && b <= '9'.toByte) || b == '_'.toByte

  /** Token (start, end) byte offsets over the LOWERED bytes. */
  private def tokenRuns(bytes: Array[Byte]): (Array[Int], Int) = {
    val n = bytes.length
    val runs = new Array[Int](32 max 2)
    var buf = runs
    var cnt = 0
    var i = 0
    var start = -1
    while (i <= n) {
      val w = i < n && classByte(bytes(i))
      if (w && start < 0) start = i
      else if (!w && start >= 0) {
        if (2 * cnt + 2 > buf.length) {
          val nb = new Array[Int](buf.length * 2)
          System.arraycopy(buf, 0, nb, 0, buf.length)
          buf = nb
        }
        buf(2 * cnt) = start
        buf(2 * cnt + 1) = i
        cnt += 1
        start = -1
      }
      i += 1
    }
    (buf, cnt)
  }

  /** Lowered UTF-8 bytes of `s` (ASCII fast path lowers in place). */
  private def loweredBytes(s: UTF8String): Array[Byte] = {
    if (s.isFullAscii) {
      val src = s.getBytes
      var i = 0
      var needs = false
      while (i < src.length && !needs) {
        if (src(i) >= 'A'.toByte && src(i) <= 'Z'.toByte) needs = true
        i += 1
      }
      if (!needs) src
      else {
        val out = src.clone()
        var k = 0
        while (k < out.length) {
          val b = out(k)
          if (b >= 'A'.toByte && b <= 'Z'.toByte) out(k) = (b + 32).toByte
          k += 1
        }
        out
      }
    } else s.toLowerCase.getBytes
  }

  /** All space-joined word `n`-grams (multiplicity kept; `distinct`
    * fuses an array_distinct), `[]` below `n` tokens.
    */
  def grams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = loweredBytes(s)
    val (runs, cnt) = tokenRuns(bytes)
    if (cnt < n) return new GenericArrayData(new Array[Any](0))
    val total = cnt - n + 1
    if (!distinct) {
      val out = new Array[Any](total)
      var p = 0
      while (p < total) {
        out(p) = gramAt(bytes, runs, p, n)
        p += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.HashSet[UTF8String](total * 2)
      val buf = new java.util.ArrayList[AnyRef](total)
      var p = 0
      while (p < total) {
        val g = gramAt(bytes, runs, p, n)
        if (seen.add(g)) buf.add(g)
        p += 1
      }
      new GenericArrayData(buf.toArray)
    }
  }

  /** Space-joined gram of tokens [p, p+n) — one allocation. */
  private def gramAt(bytes: Array[Byte], runs: Array[Int], p: Int,
      n: Int): UTF8String = {
    var len = n - 1 // the separating spaces
    var j = 0
    while (j < n) {
      len += runs(2 * (p + j) + 1) - runs(2 * (p + j))
      j += 1
    }
    val out = new Array[Byte](len)
    var w = 0
    j = 0
    while (j < n) {
      if (j > 0) { out(w) = ' '.toByte; w += 1 }
      val st = runs(2 * (p + j))
      val en = runs(2 * (p + j) + 1)
      System.arraycopy(bytes, st, out, w, en - st)
      w += en - st
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column API: tokens (n = 1), n-grams, distinct n-grams. */
  def tokens(c: Column): Column = ngrams(c, 1)
  def ngrams(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      AsciiNgramsExpr(org.apache.spark.sql.GraftBridge.expression(c), n,
        distinct = false))
  def ngramsDistinct(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      AsciiNgramsExpr(org.apache.spark.sql.GraftBridge.expression(c), n,
        distinct = true))
}

case class AsciiNgramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1: $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires string, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    AsciiGrams.grams(v.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.text.AsciiGrams.grams($c, $n, $distinct)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
