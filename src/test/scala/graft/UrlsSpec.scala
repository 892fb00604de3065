package graft

import org.apache.spark.sql.functions._

import graft.functions.Urls

/** Edge cases of the URL canonicalizer (functions/Urls.scala) the x34
  * registry oracle's two-variant construction cannot reach: scheme-less
  * strings, non-default ports, utm-only queries, https:443, nulls.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(Option(url)).toDF("u")
      .select(Urls.canonicalizeUrl(col("u")).as("c"))
      .collect()(0).getString(0)

  test("case, default port, fragment, utm params, param order") {
    assert(canon("HTTP://Example.COM:80/a/b?z=1&utm_source=x&a=2#frag")
      == "http://example.com/a/b?a=2&z=1")
    assert(canon("https://Example.com:443/") == "https://example.com/")
  }

  test("non-default ports survive; the default of the OTHER scheme too") {
    assert(canon("http://example.com:8080/x") ==
      "http://example.com:8080/x")
    assert(canon("http://example.com:443/x") ==
      "http://example.com:443/x")
    assert(canon("https://example.com:80/x") ==
      "https://example.com:80/x")
  }

  test("utm-only query drops the '?'; empty query idempotent") {
    assert(canon("http://a.com/p?utm_source=x&utm_medium=y")
      == "http://a.com/p")
    assert(canon("http://a.com/p?") == "http://a.com/p")
    val once = canon("HTTP://A.com:80/p?b=2&a=1#f")
    assert(canon(once) == once)     // canonical form is a fixed point
  }

  test("userinfo stays case-sensitive; the host after it still lowercases") {
    // RFC 3986 lowercases only scheme and host — tokens/usernames in
    // userinfo identify distinct resources and must survive verbatim
    assert(canon("http://TokenABC@Example.COM/x") ==
      "http://TokenABC@example.com/x")
    assert(canon("HTTP://User:Pw@HOST.com:80/p?b=1&a=2") ==
      "http://User:Pw@host.com/p?a=2&b=1")
  }

  test("scheme-less inputs canonicalize to a FIXED POINT, never throw") {
    val once = canon("Example.com/path?b=2&a=1")
    assert(once == "example.com/path?a=1&b=2")
    assert(canon(once) == once)      // no '://' accretion on re-apply
    // the legacy '://'-prefixed canonical form re-converges too
    assert(canon("://example.com/x") == "example.com/x")
    val n = Seq(Option.empty[String]).toDF("u")
      .select(Urls.canonicalizeUrl(col("u")).as("c")).collect()(0)
    assert(n.isNullAt(0))
  }
}
