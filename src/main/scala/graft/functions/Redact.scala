package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data curation: pattern-based redaction
  * of emails, phone-like digit runs, and generic numeric identifiers.
  *
  * Pure `regexp_replace`/`regexp_count` column expressions — codegen'd,
  * no UDFs — and the patterns avoid constructs whose semantics differ
  * between Java regex and RE2-family engines (no backrefs, no
  * lookaround), so an external auditor reproduces the exact output.
  */
object Redact {

  /** Email addresses (pragmatic pattern, not RFC 5322). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-like digit runs: 7+ digits with optional separators. */
  val PhoneRe = "\\+?[0-9][0-9() .-]{5,}[0-9]"

  /** Generic numeric identifiers: standalone runs of `minDigits`+. */
  def digitsRe(minDigits: Int): String = s"[0-9]{$minDigits,}"

  /** Replace every match of `pattern` with `token`. */
  def redact(c: Column, pattern: String, token: String): Column =
    regexp_replace(c, pattern, token)

  /** Number of matches of `pattern` (for redaction audit columns). */
  def matchCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern))

  /** The standard scrub chain: emails first (their local parts contain
    * digits), then digit-run identifiers.
    */
  def scrub(c: Column, minDigits: Int = 2): Column =
    redact(redact(c, EmailRe, "<EMAIL>"), digitsRe(minDigits), "<NUM>")
}
