package graft.analysis

import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Deflate compression ratio as a text-quality signal (compressed bytes /
  * raw bytes): highly repetitive machine-generated or templated text
  * compresses far below natural prose, making the ratio a cheap
  * repetition/quality gate (used alongside Gopher-style signals in modern
  * corpus curation).
  *
  * UDF justified (SURVEY §4.3 preference order): the JDK Deflater is
  * procedural byte-stream state no Column combination expresses. Scoring
  * is embarrassingly parallel and shuffle-free — one pass over the scan,
  * no exchange, so it scales linearly with executors. Not DuckDB-
  * expressible (no SQL zlib) — verified by property specs (repetition ⇒
  * lower ratio, empty ⇒ 1.0, bounds) instead of the hash oracle.
  */
object Compression {

  private def compressedLen(in: Array[Byte]): Long = {
    // raw deflate (nowrap), fixed level: deterministic for a given JDK
    val d = new Deflater(Deflater.BEST_SPEED, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out
    } finally d.end()
  }

  private val ratioUdf = udf { (s: String) =>
    if (s == null || s.isEmpty) 1.0
    else {
      val in = s.getBytes(StandardCharsets.UTF_8)
      compressedLen(in).toDouble / in.length
    }
  }

  def deflateRatio(c: Column): Column = ratioUdf(c)

  /** Compressed byte length, 0 for null/empty (the ratio's 1.0 special
    * case carries no deflate information). This is the `ta_compress_ratio`
    * side-channel export: the deflate byte stream is the ONE thing DuckDB
    * cannot recompute (no SQL zlib), so just its length crosses the
    * channel — UTF-8 byte counts, the ratio division and the empty-text
    * case are all recomputed by the oracle (VERDICT r7 #5).
    */
  private val lenUdf = udf { (s: String) =>
    if (s == null || s.isEmpty) 0L
    else compressedLen(s.getBytes(StandardCharsets.UTF_8))
  }

  def deflateLen(c: Column): Column = lenUdf(c)
}
