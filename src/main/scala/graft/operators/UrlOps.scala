package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL curation primitives — the crawl-side steps CCNet/C4-style
  * pipelines key on the URL rather than the text: authority-host
  * extraction, registered-domain derivation (blocklists and per-site
  * quotas group on this), and tracking-parameter-stripping
  * normalization (URL-level dedup collapses `utm_*` variants of the
  * same page before any text is fetched).
  *
  * Scale shape: everything here is per-row string work on a codegen'd
  * built-in (`parse_url`, `split`, higher-order `filter`) — map-only,
  * no exchange, no UDF. Registered-domain is the last-two-labels
  * heuristic; a production deployment swaps in a broadcast
  * public-suffix set at the same call site (the derivation stays a
  * per-row lookup, never a join of the corpus against the suffix
  * list).
  */
object UrlOps {

  /** Lowercased authority host (`parse_url` built-in). */
  def host(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /** Last-two-label registered domain of a lowercased host. */
  def registeredDomain(h: Column): Column =
    array_join(slice(split(h, "[.]"), -2, 2), ".")

  /** Canonical form: lowercased host, path, query with `utm_*`
    * tracking parameters removed, fragment dropped. Two fetches of
    * the same page through different campaign links normalize equal —
    * the key URL-level dedup groups on. */
  def normalized(url: Column): Column = {
    val kept = array_join(
      filter(split(coalesce(parse_url(url, lit("QUERY")), lit("")), "&"),
        x => !x.startsWith("utm_") && x =!= ""), "&")
    concat(lit("https://"), host(url), parse_url(url, lit("PATH")),
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }
}
