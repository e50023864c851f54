package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL / domain analysis for corpus curation (RefinedWeb/dolma-style URL
  * filtering). Pure `Column` expressions over one scan; regexes stay in
  * the Java-regex/RE2 common subset so the ops are oracle-checkable.
  */
object Urls {

  /** http(s) URLs up to the next whitespace. */
  val UrlRe: String = "https?://[^\\s]+"

  private val HostRe: String = "https?://([^/\\s]+)"

  def extractUrls(c: Column): Column =
    regexp_extract_all(c, lit(UrlRe), lit(0))

  /** Distinct lowercased hosts of every URL in the document, sorted (a
    * deterministic set rendering for cross-engine comparison).
    */
  def domains(c: Column): Column =
    array_sort(array_distinct(transform(extractUrls(c),
      u => lower(regexp_extract(u, HostRe, 1)))))

  /** True when any extracted domain equals a blocklisted domain or is a
    * subdomain of one.
    */
  def hasBlockedDomain(c: Column, blocklist: Seq[String]): Column =
    if (blocklist.isEmpty) lit(false)
    else exists(domains(c), d =>
      blocklist.map(b => d === b || d.endsWith("." + b)).reduce(_ || _))
}
