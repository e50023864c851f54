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
}
