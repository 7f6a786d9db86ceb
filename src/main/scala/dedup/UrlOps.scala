package dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL operators for web-corpus pipelines — host extraction, naive
  * registrable domain, and conservative normalization, all as pure
  * Catalyst expressions (codegen'd, no UDF, replicable in plain SQL —
  * the q_url_host oracle recomputes them with the same regexes).
  *
  * Why these exist: Common-Crawl-scale corpora are grouped, capped and
  * blocklisted PER HOST/DOMAIN (host frequency caps, domain blocklists,
  * per-site dedup), and crawl URLs arrive denormalized (mixed-case
  * schemes/hosts, userinfo, default ports, fragments) — the reference
  * keys rows by raw url (`fuzzy_spark2.py` id column), which splits one
  * logical page across trivially-different spellings.
  */
object UrlOps {

  /** Lowercased host: authority of a scheme://… URL with userinfo and
    * port stripped; empty string for non-URL input (never null on
    * non-null input — group-by safe). */
  def host(url: Column): Column =
    lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** Naive registrable domain = last two dot-labels of the host. A
    * production deployment swaps in the Public Suffix List (this returns
    * "co.uk" for UK sites — documented stand-in, same column contract). */
  def domain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** Conservative URL normalization for use as a dedup/grouping key:
    * lowercase scheme+authority, strip the fragment, strip default ports
    * (:80 for http, :443 for https). Path and query are preserved
    * byte-for-byte (case matters there). Non-URL strings pass through
    * with only the fragment stripped. */
  def normalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val auth = lower(regexp_extract(noFrag, "^([^/?#]*://[^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[^/?#]*://[^/?#]*([\\s\\S]*)$", 1)
    val authNoPort =
      regexp_replace(
        regexp_replace(auth, "^(http://[^:]*):80$", "$1"),
        "^(https://[^:]*):443$", "$1")
    when(auth === "", noFrag).otherwise(concat(authNoPort, rest))
  }

  /** Per-host quality rollup — the signal domain-level curation keys on
    * (RefinedWeb/C4 drop whole hosts whose page-level quality pass rate is
    * low; crawler scheduling re-weights by it). One pass of the
    * integer-exact Gopher gate ([[TextAnalysis.qualityFilter]]) then a
    * single partial-aggregated groupBy on the host — cardinality is the
    * number of HOSTS (≪ docs, ~10⁸ at crawl scale vs 10¹² pages), so the
    * shuffle carries only map-side-combined per-host partials and the
    * result is broadcast-join-sized for the subsequent blocklist join.
    * `pass_per_mille` stays in integer division (`div`) — no float
    * boundary anywhere, replicable bit-exactly in any SQL engine.
    *
    * Output: host, docs, pass_docs, tokens, pass_per_mille. */
  def hostQuality(
      df: org.apache.spark.sql.DataFrame,
      urlCol: String,
      textCol: String,
      q: TextAnalysis.QualityConfig = TextAnalysis.QualityConfig()): org.apache.spark.sql.DataFrame =
    TextAnalysis.qualityFilter(df, textCol, q)
      .groupBy(host(col(urlCol)).as("host"))
      .agg(count(lit(1)).as("docs"),
        sum(col("keep").cast("long")).as("pass_docs"),
        sum(col("n_tokens")).as("tokens"))
      .withColumn("pass_per_mille", expr("(pass_docs * 1000) div docs"))
}
