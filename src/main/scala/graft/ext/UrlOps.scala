package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + per-domain curation — the crawl-frontier
  * slot of a web-corpus pipeline (the RefinedWeb/CCNet steps that
  * precede every fetch-and-extract run): normalize messy URLs to a
  * canonical form so URL-level dedup can run BEFORE any text is
  * fetched, extract the registered domain, and cap each domain's
  * contribution to the corpus. Reference has no counterpart (brief
  * §ext); the normalization rules are the standard RFC 3986 +
  * tracking-param hygiene set.
  *
  * Everything is string-exact — lowercase, regex component splits,
  * parameter sort — so the DuckDB gate pins each rule with no float
  * anywhere. All pure zero-shuffle projections except the explicit
  * per-domain cap, which shuffles on the domain key only.
  *
  * Regex policy: patterns stay in the Java∩RE2 common subset (no
  * lookahead/backreferences — the [[TextOps]] BPE-pretokenizer rule),
  * so Spark (java.util.regex) and DuckDB (RE2) match identically.
  */
object UrlOps {

  /** Scheme, lowercased: `https` from `HTTPS://...`. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Host, lowercased, default port and `www.` prefix stripped.
    * Port stripping is scheme-aware: :80 only for http, :443 only
    * for https (a non-default port is meaningful and survives). */
  def host(url: Column): Column = {
    val raw = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val noPort = when(scheme(url) === "http", regexp_replace(raw, ":80$", ""))
      .when(scheme(url) === "https", regexp_replace(raw, ":443$", ""))
      .otherwise(raw)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Path component with any trailing slash removed (`/a/b/` ≡
    * `/a/b`; the root path collapses to empty). */
  def path(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")

  /** Query string: tracking parameters dropped (utm_*, fbclid,
    * gclid, ref), remaining `k=v` pairs sorted — parameter order
    * never distinguishes two URLs. Empty when nothing survives. */
  def query(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(q, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="))
    array_join(array_sort(kept), "&")
  }

  /** Canonical URL: lowercased scheme/host, default port and `www.`
    * gone, trailing slash gone, fragment gone, tracking params gone,
    * surviving params sorted. */
  def normalize(url: Column): Column = {
    val q = query(url)
    concat(scheme(url), lit("://"), host(url), path(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Registered domain: the last two dot-labels of [[host]]
    * (`cdn.src4.example.com` → `example.com`). The public-suffix
    * list is the production refinement; two labels is the
    * deterministic teaching form the gate pins. */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)
}
