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

  /** Query params that never change content identity. */
  val TrackingParamRe: String = "^(utm_[A-Za-z]+|fbclid|gclid|ref)="

  /** Canonical form of a URL column for dedup keying — the CC-crawl-style
    * URL dedup that runs BEFORE any content dedup (same page fetched via
    * differently-decorated links must collapse to one key):
    * lowercase scheme+host, strip `www.`, strip default ports (:80/:443 —
    * for either scheme, a documented simplification), drop the fragment,
    * drop tracking query params (order of surviving params preserved),
    * trim one trailing path slash.
    *
    * Pure `Column` chain (codegen, no UDF), backreference-free so the
    * identical steps are expressible in RE2-style SQL engines — the
    * `dedup_url_canonical` oracle replays every step. Assumes the input
    * is a URL; non-URLs pass through with only the generic steps applied.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val head = regexp_extract(noFrag, "(?i)^https?://[^/?#]*", 0)
    val rest = noFrag.substr(length(head) + 1, length(noFrag))
    // plain (non-regex) replace dodges the backreference a
    // `^(https?://)www\.` rewrite would need
    val host = regexp_replace(
      replace(lower(head), lit("://www."), lit("://")), ":(80|443)$", "")
    val path = regexp_extract(rest, "^[^?]*", 0)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val qf = array_join(
      filter(split(query, "&"), p =>
        p =!= "" && not(p.rlike(TrackingParamRe))), "&")
    concat(host, regexp_replace(path, "/$", ""),
      when(qf === "", lit("")).otherwise(concat(lit("?"), qf)))
  }
}
