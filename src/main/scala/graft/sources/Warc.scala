package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** WARC (ISO 28500) record parsing — the Common Crawl ingestion format:
  * at 100 TB the corpus arrives as WARC/WET files, not parquet, and the
  * record splitter is the first operator of every real crawl pipeline.
  * Binary-columns-with-typed-metadata shape like
  * [[graft.multimodal.Multimodal]]: the raw bytes stay opaque, a REAL
  * parser lifts the typed fields.
  *
  * A WARC file is concatenated records:
  * `WARC/1.0\r\n` + header lines `Name: value\r\n` + `\r\n` +
  * exactly `Content-Length` payload bytes + `\r\n\r\n`. The parser
  * walks records strictly: a malformed version line, a header without
  * a colon, an unparseable/negative Content-Length, or a payload
  * extending past the buffer stops the walk and keeps the records
  * already parsed — a truncated tail record is NOT emitted (its
  * declared length is a promise the bytes don't keep). Header names
  * are case-insensitive, header order free, unknown headers skipped;
  * a record missing the trailing CRLF CRLF separator is emitted and
  * ends the walk. Long arithmetic throughout — a hostile declared
  * length cannot wrap the cursor.
  *
  * Scale shape: a per-row flatMap (one record batch per binary value)
  * — zero shuffles; the splitter composes with `spark.read.format
  * ("binaryFile")` for whole-file ingestion and every downstream
  * operator sees ordinary typed columns.
  */
object Warc {

  /** (warc_type, target_uri, content_length, payload-as-UTF-8);
    * `target_uri` is "" when the record carries no WARC-Target-URI
    * (warcinfo records).
    */
  type Record = (String, String, Long, String)

  /** ASCII line up to CRLF starting at `i`; None when no CRLF remains. */
  private def readLine(b: Array[Byte], i: Long): Option[(String, Long)] = {
    var j = i
    while (j + 1 < b.length && !(b(j.toInt) == '\r' && b(j.toInt + 1) == '\n'))
      j += 1
    if (j + 1 >= b.length) None
    else Some((new String(b, i.toInt, (j - i).toInt, "UTF-8"), j + 2))
  }

  /** Transparent gunzip: Common Crawl ships `.warc.gz`/`.wet.gz` — a
    * CONCATENATION of per-record gzip members (the WARC spec's
    * record-at-a-time compression), which `GZIPInputStream` walks
    * natively (it chains multi-member streams). Sniffed by the 1f 8b
    * magic, so plain bytes pass through untouched. Memory: the file
    * inflates into one array — same per-file bound `binaryFile`
    * ingestion already imposes on the compressed bytes; WET extracts
    * (the text-pipeline input) run ~3× compressed size.
    */
  private[sources] def gunzipIfNeeded(b: Array[Byte]): Array[Byte] =
    if (b == null || b.length < 2 ||
        b(0) != 0x1f.toByte || b(1) != 0x8b.toByte) b
    else {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 1 << 16)
      try {
        val out = new java.io.ByteArrayOutputStream(
          math.min(b.length.toLong * 4L, (Int.MaxValue / 2).toLong).toInt)
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    }

  def parseRecords(raw: Array[Byte]): Seq[Record] = {
    if (raw == null) return Seq.empty
    val b = gunzipIfNeeded(raw)
    val out = scala.collection.mutable.ArrayBuffer[Record]()
    var i = 0L
    var ok = true
    while (ok && i < b.length) {
      readLine(b, i) match {
        case Some(("WARC/1.0", afterVersion)) =>
          var j = afterVersion
          var wtype = ""
          var uri = ""
          var clen = -1L
          var headersOk = true
          var blank = false
          while (headersOk && !blank) {
            readLine(b, j) match {
              case Some(("", nj)) => blank = true; j = nj
              case Some((line, nj)) =>
                val c = line.indexOf(':')
                if (c <= 0) headersOk = false
                else {
                  val k = line.substring(0, c).trim
                    .toLowerCase(java.util.Locale.ROOT)
                  val v = line.substring(c + 1).trim
                  k match {
                    case "warc-type" => wtype = v
                    case "warc-target-uri" => uri = v
                    case "content-length" =>
                      clen = try v.toLong catch { case _: Exception => -1L }
                    case _ => ()
                  }
                  j = nj
                }
              case None => headersOk = false
            }
          }
          if (!headersOk || clen < 0 || j + clen > b.length) ok = false
          else {
            out += ((wtype, uri, clen,
              new String(b, j.toInt, clen.toInt, "UTF-8")))
            val sep = j + clen
            // the CRLF CRLF record separator; absent/partial ends the walk
            if (sep + 4 <= b.length && b(sep.toInt) == '\r' &&
                b(sep.toInt + 1) == '\n' && b(sep.toInt + 2) == '\r' &&
                b(sep.toInt + 3) == '\n') i = sep + 4
            else ok = false
          }
        case _ => ok = false
      }
    }
    out.toSeq
  }

  val RecordType: ArrayType = ArrayType(StructType(Seq(
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType),
    StructField("payload", StringType))))

  /** Record splitter as a Column: binary → array of typed records. */
  val recordsUdf: Column => Column = {
    val u = udf { (b: Array[Byte]) => parseRecords(b) }
    c => u(c).cast(RecordType)
  }
}
