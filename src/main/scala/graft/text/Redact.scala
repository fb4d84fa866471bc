package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: replace e-mail addresses,
  * phone-like numbers, IPv4 addresses, and long digit runs (account/card
  * numbers) with typed placeholder tokens, and count what was redacted so
  * the pipeline can audit/threshold (docs with extreme PII density are
  * usually boilerplate dumps worth dropping). Extension beyond the
  * reference surface (SURVEY §2.11 training-data scope).
  *
  * All patterns are RE2-compatible (no backreferences or lookaround), so a
  * SQL engine with RE2 regexes (the DuckDB oracle) reproduces the rewrite
  * byte-for-byte — and so the hot path stays inside whole-stage codegen
  * (`regexp_replace`/`regexp_extract_all` are native Catalyst expressions;
  * zero UDFs, zero shuffles; scales as a map over input splits).
  *
  * Order matters and is fixed: emails first (their local part can contain
  * digits that would otherwise be eaten by the digit-run rule), then IPv4
  * (dotted digits must not be split by the phone rule), then phones, then
  * bare digit runs on what remains.
  */
object Redact {

  /** user@host.tld — conservative: alnum/._%+- local part, dotted domain. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (1-3 digits per octet; no range check — redaction
    * should over-trigger, not under-trigger). */
  val ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Phone-ish: optional +country, then 7+ digits with optional space/dash/
    * paren separators, anchored on digit boundaries via the leading +/digit. */
  val phoneRe = "\\+?[0-9][0-9()\\-\\. ]{5,}[0-9]"

  /** 6+ consecutive digits (account numbers, cards, SSNs without dashes). */
  val digitRunRe = "[0-9]{6,}"

  /** The fixed rewrite chain (see class doc for why this order). */
  private val chain: Seq[(String, String)] = Seq(
    emailRe -> "[EMAIL]",
    ipv4Re -> "[IP]",
    phoneRe -> "[PHONE]",
    digitRunRe -> "[NUMBER]")

  /** Redacted text column. */
  def redact(text: Column): Column =
    chain.foldLeft(text) { case (c, (re, tok)) => regexp_replace(c, re, tok) }

  /** Match count for one pattern class on the ORIGINAL text. */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** One projection: redacted text + per-class counts on the original.
    * Counts are taken on the raw text, so (unlike the rewrite) they are
    * order-independent and a count can exceed its class's replacement count
    * (e.g. the digits inside an e-mail are counted as a digit run but
    * already redacted as [EMAIL]). */
  def withRedaction(df: DataFrame, textCol: String): DataFrame =
    df.select(col("*"),
      redact(col(textCol)).as(s"${textCol}_redacted"),
      piiCount(col(textCol), emailRe).as("n_emails"),
      piiCount(col(textCol), ipv4Re).as("n_ips"),
      piiCount(col(textCol), phoneRe).as("n_phones"),
      piiCount(col(textCol), digitRunRe).as("n_digit_runs"))
}
