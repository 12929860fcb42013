package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrub pass every training-data
  * pipeline runs before text leaves the trust boundary (emails, phone
  * numbers, IP addresses → typed placeholders), kept deliberately
  * regex-based so the whole operator is row-local codegen'd string work:
  * no UDF, no dictionary shuffle, embarrassingly parallel at any scale.
  *
  * The patterns use the COMMON subset of Java regex (Spark) and RE2
  * (DuckDB oracle): no word-boundary `\b`, no `\d` shorthand, no
  * lookaround — both engines produce byte-identical matches, so
  * redacted text hash-matches cross-engine. Counts are taken on the
  * RAW text, then placeholders substitute in fixed order (email →
  * phone → IP); placeholders contain no digits so later passes cannot
  * re-match inside earlier substitutions.
  *
  * ==Which PII module to use==
  * This is the ORACLE-GRADE scrub: patterns restricted to the Java∩RE2
  * subset so redacted text hash-matches DuckDB bit-for-bit, counts on
  * RAW text (an IP inside an email counts as both), `[TYPE]`
  * placeholders. [[graft.functions.TextFunctions]] carries the
  * QUALITY-SCORING variant: broader patterns (`\b`, `+`-prefixed
  * phones), `<TYPE>` placeholders, and counts taken AFTER each prior
  * redaction so they reconcile exactly with its redacted output. Use
  * PiiScrub when output text must be cross-engine verifiable; use
  * TextFunctions.piiCounts when counts must sum to the number of
  * replacements actually made.
  */
object PiiScrub {

  /** Greedy local@domain — both engines match leftmost-greedy over
    * this alphabet, so boundaries agree byte-for-byte.
    */
  val EmailRe = "[A-Za-z0-9.]+@[A-Za-z0-9.]+"

  /** NANP-style fixture shape `+1-NNN-NNNN`. */
  val PhoneRe = "[+]1-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4. */
  val IpRe = "([0-9]{1,3}[.]){3}[0-9]{1,3}"

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailRe))
  def countPhones(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def countIps(text: Column): Column = regexp_count(text, lit(IpRe))

  /** Replace every match with its typed placeholder, email → phone →
    * IP. IP runs AFTER email so a dotted-quad inside a (already
    * redacted) email local-part can never be double-redacted.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      IpRe, "[IP]")
}
