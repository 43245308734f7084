package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the privacy screen every training-data
  * pipeline runs before text leaves curation (emails, IPv4 addresses,
  * phone-shaped numbers scrubbed to typed placeholder tokens).
  * Reference framing: the same per-document pure-function tier as
  * [[TextAnalysis]] quality/language scoring.
  *
  * All pure builtin column expressions (`regexp_count` /
  * `regexp_replace` — codegen'd, no UDFs), so detection AND redaction
  * run inside WholeStageCodegen over the parquet scan: at 100 TB this
  * is a single narrow map stage, zero shuffle, and the regex engine is
  * the only cost. Per-type counts take one pass per pattern; redaction
  * chains the same patterns in a fixed documented order. The patterns
  * deliberately use the Java-regex ∩ RE2 common subset (no lookaround,
  * no backreferences) so external auditors — and the DuckDB oracle in
  * `ScalarQueries` q78 — can run the SAME pattern text and get the
  * same matches.
  *
  * These are pattern-tier detectors (the classic C4/CCNet-style
  * scrubbers), not an NER model: names/addresses need a model pass,
  * which would ride the same batched surface as
  * [[graft.multimodal.Multimodal]] feature extraction.
  */
object Pii {

  /** RFC-ish email mailbox: local part then a dotted domain with an
    * alphabetic TLD (which is also why a dotted quad never matches).
    */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so log-style `10.0.0.7.` still hits
    * but digit runs inside longer numbers don't. Octet range is NOT
    * enforced (999.0.0.1 matches) — the screen prefers recall;
    * redacting a non-address costs nothing.
    */
  val Ipv4Regex = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-shaped hyphenated phone number (`312-555-0184`). */
  val PhoneRegex = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Redaction order is part of the contract: emails first (so a
    * domain's dotted shape can never be half-eaten by the IP rule),
    * then IPs, then phones. Every consumer — including the oracle —
    * must apply the same order for byte-identical output.
    */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("emails", EmailRegex, "<EMAIL>"),
    ("ipv4", Ipv4Regex, "<IP>"),
    ("phones", PhoneRegex, "<PHONE>"))

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRegex))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Regex))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRegex))

  /** Per-document counts by PII type, as a struct:
    * `(n_emails, n_ipv4, n_phones)` — long, so downstream sums don't
    * overflow at corpus scale.
    */
  def piiStats(c: Column): Column = struct(
    emailCount(c).cast("long").as("n_emails"),
    ipv4Count(c).cast("long").as("n_ipv4"),
    phoneCount(c).cast("long").as("n_phones"))

  /** The scrubbed text: every match replaced by its type token, in
    * [[Patterns]] order. Idempotent (no placeholder matches any
    * pattern).
    */
  def redact(c: Column): Column =
    Patterns.foldLeft(c) { case (acc, (_, pat, tok)) =>
      regexp_replace(acc, pat, tok)
    }

  /** True iff the document carries no detectable PII — the keep-side
    * predicate. Cheaper than [[piiStats]] when only the flag is
    * needed, but still one regex pass per pattern; a corpus split
    * should compute [[redact]] once instead of filtering then
    * re-scanning.
    */
  def isClean(c: Column): Column =
    Patterns.map { case (_, pat, _) => regexp_count(c, lit(pat)) === 0 }
      .reduce(_ && _)
}
