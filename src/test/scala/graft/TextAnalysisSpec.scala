package graft

import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** PII redaction edge cases (the bulk of TextAnalysis is covered by the
  * t01–t05 oracle gate; these pin the redaction-order semantics).
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.redactPii(col("t"))).head.getString(0)

  test("emails, IPs, and phones redact to typed placeholders") {
    assert(redact("mail a.b+c@d-e.org now") == "mail <EMAIL> now")
    assert(redact("host 192.168.0.1 down") == "host <IP> down")
    assert(redact("call +44 20 7946 0958 ok") == "call <PHONE> ok")
    assert(redact("x 555-867-5309 y") == "x <PHONE> y")
  }

  test("ordering: emails keep their digits, IPs are not eaten by phones") {
    // the email's digit run must not surface as a phone after redaction
    assert(redact("u12345678@ex.com") == "<EMAIL>")
    // a dotted quad is an IP, not two phone fragments
    assert(redact("10.0.200.7") == "<IP>")
  }

  test("clean text passes through untouched") {
    val s = "a plain sentence with numbers like 42 and 7 in it"
    assert(redact(s) == s)
  }

  test("dates, short ids, and sparse digit runs are NOT phones") {
    // ISO date: 8 digits < the 9-digit phone floor
    assert(redact("logged 2024-01-01 ok") == "logged 2024-01-01 ok")
    // 8-digit numeric id survives; 9-digit run is phone-plausible PII
    assert(redact("order 12345678 shipped") == "order 12345678 shipped")
    assert(redact("ssn-ish 123456789 here") == "ssn-ish <PHONE> here")
    // double separators break the run: "1 - 2" style prose never matches
    assert(redact("range 1 - 23456789 - 0 end") == "range 1 - 23456789 - 0 end")
  }

  test("long card-like digit runs are swallowed whole") {
    assert(redact("card 1234-5678-9012-3456 x") == "card <PHONE> x")
    assert(redact("raw 12345678901234567890") == "raw <PHONE>")
  }

  test("redaction is idempotent (placeholders never re-match)") {
    val samples = Seq(
      "a@b.co and 10.1.2.3 and +1 555 123 4567 mixed",
      "u12345678@ex.com 10.0.200.7",
      "edge: 1.2.3.4.5.6 partial 999-99")
    for (s <- samples) assert(redact(redact(s)) == redact(s), s)
  }
}
