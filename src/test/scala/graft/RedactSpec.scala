package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Redact

class RedactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redactOne(s: String): (String, Int, Int, Int, Int) = {
    val df = Seq((1L, s)).toDF("id", "text")
    Redact.withRedaction(df, "text")
      .select("text_redacted", "n_emails", "n_ips", "n_phones", "n_digit_runs")
      .as[(String, Int, Int, Int, Int)].head()
  }

  test("emails are redacted and counted") {
    val (out, e, _, _, _) = redactOne("mail me at jo.smith+x@sub.example.co or admin@a.io now")
    assert(out == "mail me at [EMAIL] or [EMAIL] now")
    assert(e == 2)
  }

  test("ipv4 redacted before the phone rule can split it") {
    val (out, _, ips, _, _) = redactOne("server 10.0.255.1 down")
    assert(out == "server [IP] down")
    assert(ips == 1)
  }

  test("phone-like sequences redacted; short digit groups survive") {
    val (out, _, _, p, _) = redactOne("call +44 20 7946 0958 or ext 42")
    assert(out == "call [PHONE] or ext 42")
    assert(p == 1)
  }

  test("6+ digit runs redacted as numbers; 5 digits survive") {
    val (out, _, _, _, d) = redactOne("acct 123456 pin 12345")
    assert(out == "acct [NUMBER] pin 12345")
    assert(d == 1)
  }

  test("email digits are not double-redacted by later rules") {
    val (out, e, _, _, d) = redactOne("reach 123456789@example.com today")
    assert(out == "reach [EMAIL] today")
    assert(e == 1)
    assert(d == 1) // counts are on the ORIGINAL text, so the run still counts
  }

  test("clean text passes through untouched") {
    val (out, e, i, p, d) = redactOne("no personal data in this sentence")
    assert(out == "no personal data in this sentence")
    assert(e == 0 && i == 0 && p == 0 && d == 0)
  }
}
