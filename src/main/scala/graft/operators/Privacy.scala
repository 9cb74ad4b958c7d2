package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: per-document
  * counts of emails / phone numbers / IPv4 addresses, and a masking
  * transform that replaces each occurrence with a typed placeholder.
  *
  * Everything is a codegen'd `regexp_extract_all` / `regexp_replace`
  * expression — no UDFs, so the whole pass stays inside whole-stage
  * codegen and scales as a pure map over the corpus (no shuffle at all).
  *
  * The patterns are deliberately written in the common subset of Java
  * regex (Spark) and RE2 (DuckDB/Go): no lookaround, no backreferences,
  * ASCII `\b` word boundaries — so any ANSI engine with RE2 semantics
  * reproduces the exact same matches (that is what makes the DuckDB
  * oracle for `pii_redact` valid; DuckDB needs the 'g' flag to match
  * Spark's replace-all behavior).
  *
  * Redaction order is fixed and part of the contract: emails first (their
  * local part may contain digits-and-dots that the looser numeric
  * patterns could nibble at), then IPv4, then phones.
  */
object Privacy {

  /** Email: local part @ domain with a 2+ letter TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone: 3-3-4 digit groups joined by `-` or `.`. */
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Dotted-quad IPv4 (no octet range check — detection, not validation). */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("bigint")

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("bigint")

  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("bigint")

  /** Mask every email/IPv4/phone with `<EMAIL>`/`<IP>`/`<PHONE>` (in that
    * order). Idempotent: the placeholders contain no digits or `@`, so a
    * second pass is a no-op. */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Pattern, "<IP>")
    regexp_replace(i, PhonePattern, "<PHONE>")
  }

  /** Per-document PII report: counts per category, total, and the redacted
    * text. A single narrow projection — safe to run inline in any scan.
    *
    * Counts follow the redaction cascade so categories are DISJOINT:
    * emails count on the raw text, IPs on the email-redacted text (so a
    * digits-and-dots email local part is one email, not also an IP),
    * phones on the email+IP-redacted text. n_pii is then an exact count
    * of distinct redactions performed. */
  def piiScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "<IP>")
    df.select(
      col(idCol),
      emailCount(t).as("n_emails"),
      phoneCount(afterIp).as("n_phones"),
      ipv4Count(afterEmail).as("n_ips"),
      (emailCount(t) + phoneCount(afterIp) + ipv4Count(afterEmail)).as("n_pii"),
      regexp_replace(afterIp, PhonePattern, "<PHONE>").as("redacted"))
  }
}
