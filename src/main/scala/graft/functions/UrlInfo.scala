package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL / referrer analysis (SURVEY.md §2.3 F15–F17;
  * etl/transform/frontend_transformer.py:100-233). Built on Spark's
  * parse_url (codegen'd) — equivalent to Python urlparse for well-formed
  * http(s) URLs (no port/userinfo edge cases in the event surface).
  */
object UrlInfo {

  /** F15 components — regex extraction rather than Spark's parse_url:
    * ParseUrl is a non-codegen expression (it re-parses the URL per call
    * and falls out of whole-stage codegen), while regexp_extract stays in
    * the codegen'd pipeline. The patterns implement Python urlparse
    * semantics (netloc = authority up to /?#, which INCLUDES any port —
    * parse_url's HOST would strip it; path = up to ?#).
    */
  def urlDomain(u: Column): Column =
    nullif(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1), lit(""))
  def urlPath(u: Column): Column =
    nullif(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1), lit(""))
  def urlParam(u: Column, key: String): Column =
    nullif(regexp_extract(u, s"[?&]${java.util.regex.Pattern.quote(key)}=([^&#]*)", 1), lit(""))

  /** F15 query_params — the full first-value map
    * (frontend_transformer.py:117-120): parse_qs drops blank values
    * (keep_blank_values=False) and bare keys without '=', so filter
    * empty/null values out of str_to_map's output. Two documented gaps vs
    * parse_qs, neither reachable from the event surface: %-escapes are not
    * decoded, and duplicate keys (Python keeps the first) follow the
    * session's mapKeyDedupPolicy instead.
    */
  def queryParams(u: Column): Column = {
    val q = regexp_extract(u, "\\?([^#]*)", 1)
    map_filter(str_to_map(q, lit("&"), lit("=")),
      (_, v) => v.isNotNull && v =!= "")
  }

  /** F16 categorize_page — keyword buckets over the lowered path
    * (frontend_transformer.py:144-169). Order of the when-chain matches
    * the Python elif order.
    */
  def pageCategory(path: Column): Column = {
    val p = lower(path)
    when(path.isNull || path === "" || path === "/", "homepage")
      .when(p.contains("/product") || p.contains("/p/"), "product")
      .when(p.contains("/category") || p.contains("/c/") || p.contains("/collection"), "category")
      .when(p.contains("/cart") || p.contains("/checkout"), "checkout")
      .when(p.contains("/about") || p.contains("/company"), "about")
      .when(p.contains("/contact") || p.contains("/support"), "contact")
      .when(p.contains("/blog") || p.contains("/news") || p.contains("/article"), "content")
      .when(p.contains("/search") || p.contains("/results"), "search")
      .when(p.contains("/account") || p.contains("/profile") || p.contains("/dashboard"), "account")
      .otherwise("other")
  }

  val SearchEngines = Seq("google.com", "bing.com", "yahoo.com", "duckduckgo.com",
    "baidu.com", "yandex.com", "ask.com")
  val SocialPlatforms = Seq("facebook.com", "twitter.com", "linkedin.com", "instagram.com",
    "pinterest.com", "youtube.com", "tiktok.com", "snapchat.com", "reddit.com", "tumblr.com")
  val EmailPlatforms = Seq("gmail.com", "outlook.com", "yahoo.com", "mail.google.com",
    "webmail", "mail.")

  private def containsAny(c: Column, subs: Seq[String]): Column =
    subs.map(s => c.contains(s)).reduce(_ || _)

  /** F17 categorize_referrer — substring membership in domain lists,
    * search > social > email > referral; empty domain ⇒ direct
    * (frontend_transformer.py:203-233).
    */
  def referrerType(domain: Column): Column =
    when(domain.isNull || domain === "", "direct")
      .when(containsAny(domain, SearchEngines), "search")
      .when(containsAny(domain, SocialPlatforms), "social")
      .when(containsAny(domain, EmailPlatforms), "email")
      .otherwise("referral")

  /** F17 assembled: referrer string ⇒ {referrer, referrer_domain,
    * referrer_type} struct (frontend_transformer.py:171-201). The domain is
    * urlparse().netloc.lower() — netloc KEEPS port/userinfo (parse_url's
    * HOST would strip them) and is '' (not NULL) for scheme-less referrers,
    * so reuse the netloc-preserving urlDomain regex with an empty-string
    * fallback.
    */
  def referrerInfo(r: Column): Column =
    when(r.isNull || r === "",
      struct(lit(null).cast("string").as("referrer"),
        lit(null).cast("string").as("referrer_domain"),
        lit("direct").as("referrer_type")))
    .otherwise {
      val d = coalesce(lower(urlDomain(r)), lit(""))
      struct(r.as("referrer"), d.as("referrer_domain"),
        referrerType(d).as("referrer_type"))
    }

  /** URL canonicalization for web-corpus dedup (the C4/CCNet rule set):
    * strip the #fragment, lowercase scheme+authority (path stays
    * case-sensitive), drop the :443/:80 default port, remove tracking
    * params (utm_*, gclid, fbclid) while preserving real ones, drop an
    * empty trailing '?', and strip one trailing '/'. Pure regex chain —
    * map-side, codegen'd, no lookarounds (so the same patterns run on
    * RE2 engines). Step order matters and is part of the contract: the
    * oracle mirrors it verbatim.
    */
  def canonicalizeUrl(u: Column): Column = {
    // 1. fragment
    val noFrag = regexp_replace(u, "#.*$", "")
    // 2. lowercase scheme://authority, keep the rest as-is
    val pre = regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val lowered = when(pre === "", noFrag)
      .otherwise(concat(lower(pre),
        regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)))
    // 3. default ports
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]+):443(/|\\?|$)", "$1$2"),
      "^(http://[^/:?#]+):80(/|\\?|$)", "$1$2")
    // 4. tracking params: mid-query first (key=val&), then trailing
    //    (?key=val / &key=val at end-of-string)
    val noTrackMid = regexp_replace(noPort, "(utm_[a-z]+|gclid|fbclid)=[^&#]*&", "")
    val noTrack = regexp_replace(noTrackMid, "[?&](utm_[a-z]+|gclid|fbclid)=[^&#]*$", "")
    // 5. empty query, 6. trailing slash
    regexp_replace(regexp_replace(noTrack, "\\?$", ""), "([^/])/$", "$1")
  }
}
