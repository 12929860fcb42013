package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, n-grams, deterministic 60-bit token hashes, quality
  * metrics, and fingerprints. Everything is built from codegen'd
  * `org.apache.spark.sql.functions` (no UDFs), so the expressions stay
  * inside whole-stage codegen and the DuckDB oracle can mirror them
  * exactly.
  *
  * Determinism conventions shared with the oracle SQL:
  *   - token = split on a single space of `lower(text)` (the synthetic
  *     corpus is single-space separated);
  *   - hash60(s) = first 15 hex chars of md5(s) parsed base-16 → a
  *     non-negative long in [0, 2^60) — DuckDB: `('0x'||substring(md5(s),1,15))::BIGINT`;
  *   - ratios are emitted as `floor(r * 1e6)` longs, never raw doubles.
  */
object TextFunctions {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Deterministic 60-bit hash of a string, identical in Spark and DuckDB. */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Word n-grams (space-joined) from a token array. Runs as the native
    * [[NativeExpressions.WordNgrams]] expression; [[wordNgramsHof]] is the
    * bit-identical HOF reference.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    NativeExpressions.wordNgrams(toks, n)

  /** HOF reference implementation of [[wordNgrams]]. */
  def wordNgramsHof(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array())

  /** floor(x * 1e6) as a long — fp-stable ratio encoding for oracles. */
  def fp6(x: Column): Column = floor(x * lit(1000000.0)).cast("long")

  /** Number of characters matching a punctuation class. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** PII patterns — a conservative, RE2-compatible subset (no lookarounds,
    * no backreferences) so the same patterns run under Spark's java.util
    * .regex AND RE2-based engines (DuckDB, Go scrubbers) identically.
    *
    * This is the QUALITY-SCORING variant: broad patterns, `<TYPE>`
    * placeholders, counts reconciled with [[redactPii]]'s output. For
    * oracle-grade scrubbing whose redacted TEXT must hash-match a
    * RE2 engine byte-for-byte, use [[graft.operators.PiiScrub]]
    * (narrower Java∩RE2 patterns, `[TYPE]` placeholders, raw-text
    * counts) — see its Scaladoc for the full contrast.
    */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+"
  val Ipv4Re: String  = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe: String = "\\+[0-9][0-9() -]{6,}[0-9]"

  /** Per-row PII hit counts (emails, IPv4s, international-format phones) —
    * the audit signal a corpus scrub reports; row-local, zero shuffle.
    * Counts are taken in [[redactPii]]'s replacement order, each pattern
    * over the PREVIOUS pattern's redaction, so the counts reconcile
    * exactly with the scrubbed output (a phone-shaped digit run inside
    * an email is one email, not an email plus a phone).
    */
  def piiCounts(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp    = regexp_replace(noEmail, Ipv4Re, "<IP>")
    struct(
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(noEmail, lit(Ipv4Re), lit(0))).as("n_ipv4"),
      size(regexp_extract_all(noIp, lit(PhoneRe), lit(0))).as("n_phones"))
  }

  /** Redact PII in place (emails → `<EMAIL>`, IPv4 → `<IP>`, phones →
    * `<PHONE>`). Order matters: emails first so their host part is not
    * half-eaten by the IP pattern, phones last so digit runs inside the
    * other matches are gone before the greedy phone regex runs.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** MinHash-style fingerprint: min hash60 over distinct word 3-grams
    * (falls back to hash of the whole text for docs shorter than 3
    * tokens). The min-hash kernel runs as the native
    * [[NativeExpressions.MinHash60]] expression — identical to the
    * `array_min(transform(grams, hash60))` HOF form.
    */
  def fingerprint(text: Column): Column = {
    val grams = array_distinct(wordNgrams(tokens(text), 3))
    coalesce(NativeExpressions.minHash60(grams), hash60(lower(text)))
  }
}
