package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass BEFORE URL-level dedup
  * and blocklist joins (the f10 companion): crawl frontiers and link
  * graphs reach the same page through syntactic variants, and an
  * un-normalized key treats each variant as a distinct document.
  *
  * Applies the safe subset of RFC 3986 §6 syntax-based normalization
  * plus the standard crawler extensions:
  *   - scheme and host lowercase (§6.2.2.1)
  *   - default port elided (`:80` for http, `:443` for https)
  *   - fragment removed (never sent to the server)
  *   - tracking parameters (`utm_*`) dropped
  *   - remaining query parameters sorted (order-insensitive servers)
  *
  * Pure column expressions end to end — codegen-friendly, no UDF — and
  * every step replays exactly in ANSI SQL (the x34 oracle).
  */
object Urls {

  /** Canonical form of `url` (`scheme://host/path?k=v&…`). Null in,
    * null out; a string with no `scheme://` prefix passes through the
    * host/query steps with an empty scheme rather than throwing, and the
    * output then carries NO `://` prefix — so canonicalization is a
    * fixed point for scheme-less inputs too (a leading bare `://`, the
    * legacy canonical form of those, is consumed on re-parse rather than
    * accreting `://://…` per application).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)?://", "")
    val auth = regexp_extract(rest, "^([^/?]*)", 1)
    // RFC 3986 §6.2.2.1 lowercases only scheme and host — userinfo is
    // case-SENSITIVE (tokens, usernames); keep it verbatim up to the
    // last '@' of the authority
    val userinfo = when(auth.contains("@"),
      regexp_extract(auth, "^(.*@)", 1)).otherwise(lit(""))
    val hostPort = lower(regexp_extract(auth, "([^@]*)$", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQuery = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_replace(pathQuery, "\\?.*$", "")
    val query = when(pathQuery.contains("?"),
      regexp_replace(pathQuery, "^[^?]*\\?", "")).otherwise(lit(""))
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => !p.startsWith("utm_") && p =!= "")), "&")
    concat(
      when(scheme =!= "", concat(scheme, lit("://"))).otherwise(lit("")),
      userinfo, host, path,
      when(params =!= "", concat(lit("?"), params)).otherwise(lit("")))
  }
}
