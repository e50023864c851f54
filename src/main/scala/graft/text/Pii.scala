package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora (beyond-reference op: the cc_net /
  * dolma-style pre-training cleanup step). Pure codegen'd `Column`
  * expressions — three regexp_replace passes at scan speed, no UDF, no
  * shuffle; patterns restricted to the regex subset with identical
  * semantics in Java regex and DuckDB RE2 so the op is oracle-checkable.
  */
object Pii {

  /** Email addresses (common-subset pattern, both engines). */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded. */
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Long digit runs (account/card/phone-shaped), 9+ digits. */
  val LongDigitsRe: String = "\\b\\d{9,}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val NumToken = "<NUM>"

  /** Redact emails, then IPv4s, then long digit runs (emails may contain
    * digits/dots, so they go first; IPv4 octets are ≤3 digits so the two
    * later passes never overlap).
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, EmailToken),
        Ipv4Re, IpToken),
      LongDigitsRe, NumToken)
}
