package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

class WarcSpec extends AnyFunSuite {

  private def rec(headers: Seq[(String, String)], payload: String,
      version: String = "WARC/1.0", sep: String = "\r\n\r\n"): String =
    version + "\r\n" +
      headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
      "\r\n" + payload + sep

  private def parse(s: String) = Warc.parseRecords(s.getBytes("UTF-8"))

  test("two records, header order and case free, unknown headers skipped") {
    val s = rec(Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> "2026",
        "Content-Length" -> "4"), "info") +
      rec(Seq("content-length" -> "5", "warc-target-uri" -> "u://x",
        "warc-type" -> "conversion"), "hello")
    assert(parse(s) == Seq(("warcinfo", "", 4L, "info"),
      ("conversion", "u://x", 5L, "hello")))
  }

  test("truncated tail record is not emitted, prefix survives") {
    val s = rec(Seq("WARC-Type" -> "conversion", "Content-Length" -> "3"),
      "abc") +
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999999\r\n\r\nxx"
    assert(parse(s) == Seq(("conversion", "", 3L, "abc")))
  }

  test("hostile inputs: garbage, bad version, no colon, bad length") {
    assert(parse("not a warc at all").isEmpty)
    assert(parse(rec(Seq("Content-Length" -> "1"), "x",
      version = "WARC/0.9")).isEmpty)
    assert(parse("WARC/1.0\r\nbroken header line\r\n\r\nx").isEmpty)
    assert(parse(rec(Seq("Content-Length" -> "notanumber"), "x")).isEmpty)
    assert(parse(rec(Seq("Content-Length" -> "-4"), "x")).isEmpty)
    assert(parse(rec(Seq("WARC-Type" -> "x"), "no length")).isEmpty)
    assert(Warc.parseRecords(null).isEmpty)
  }

  test("missing record separator: record emitted, walk ends") {
    val s = rec(Seq("WARC-Type" -> "conversion", "Content-Length" -> "3"),
        "abc", sep = "") +
      rec(Seq("WARC-Type" -> "conversion", "Content-Length" -> "3"), "def")
    assert(parse(s) == Seq(("conversion", "", 3L, "abc")))
  }

  test("payload may contain CRLF and header-like text") {
    val p = "WARC/1.0\r\nContent-Length: 7\r\n\r\nfake"
    val s = rec(Seq("WARC-Type" -> "conversion",
      "Content-Length" -> p.getBytes("UTF-8").length.toString), p)
    assert(parse(s) == Seq(("conversion", "", p.length.toLong, p)))
  }

  test("gzip: single- and multi-member .warc.gz parse transparently") {
    // Common Crawl's on-disk form — per-record gzip MEMBERS concatenated
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close()
      bo.toByteArray
    }
    val r1 = rec(Seq("WARC-Type" -> "warcinfo", "Content-Length" -> "4"),
      "info")
    val r2 = rec(Seq("WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "u://x", "Content-Length" -> "5"), "hello")
    val want = Seq(("warcinfo", "", 4L, "info"),
      ("conversion", "u://x", 5L, "hello"))
    // whole-file single member
    assert(Warc.parseRecords(gz(r1 + r2)) == want)
    // record-at-a-time members, concatenated (the CC layout)
    assert(Warc.parseRecords(gz(r1) ++ gz(r2)) == want)
    // plain bytes still pass through untouched
    assert(parse(r1 + r2) == want)
    // a 1f 8b prefix that is NOT valid gzip fails loudly (truncated
    // member = corrupt file, not silently-empty parse)
    intercept[java.io.IOException] {
      Warc.parseRecords(Array(0x1f.toByte, 0x8b.toByte, 0x00.toByte))
    }
  }

  test("committed .warc fixture ingests through binaryFile end-to-end") {
    // VERDICT r10 #8: the actual I/O front door — a real WARC file on
    // disk (src/test/resources/fixtures/sample.warc, CRLF-framed,
    // committed as bytes) read via spark.read.format("binaryFile") and
    // split by recordsUdf; the crawl E2E builds its WARC bytes in-query
    // for the oracle, this pins the whole-file path
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    val path = new java.io.File(
      "src/test/resources/fixtures/sample.warc").getAbsolutePath
    assert(new java.io.File(path).isFile, s"fixture missing at $path")
    val recs = spark.read.format("binaryFile").load(path)
      .select(explode(Warc.recordsUdf(col("content"))).as("r"))
      .select(col("r.warc_type"), col("r.target_uri"),
        col("r.content_length"), col("r.payload"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3)))
      .toSeq
    assert(recs == Seq(
      ("warcinfo", "", 23L, "software: graft-fixture"),
      ("conversion", "https://example.org/a", 63L,
        "<html><body><p>alpha page content here today.</p></body></html>"),
      ("conversion", "https://example.org/b", 43L,
        "beta plain text payload with several words.")))
    // content_length is the parser's echo of the declared header and
    // must equal the actual payload byte length for every record
    assert(recs.forall { case (_, _, n, p) =>
      n == p.getBytes("UTF-8").length.toLong })
  }
}
