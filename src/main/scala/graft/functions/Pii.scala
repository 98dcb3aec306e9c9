package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F2 PII redaction (base_transformer.py:65-83) — ordered chain of
  * regexp_replace calls. Order matters and is preserved exactly: email,
  * dashed phone, parenthesized phone, card, SSN (a dashed phone must be
  * consumed before the SSN pattern could partially match it).
  *
  * Note the reference's parenthesized-phone pattern starts with \b before
  * "(" — a word boundary that only exists when "(" is preceded by a word
  * character, so "(555) 123-4567" after a space never matches. That
  * behavior is kept verbatim for parity.
  */
object Pii {
  val EmailRe = "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Z|a-z]{2,}\\b"
  val PhoneDashRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val PhoneParenRe = "\\b\\(\\d{3}\\)\\s*\\d{3}-\\d{4}\\b"
  val CardRe = "\\b\\d{4}[\\s-]?\\d{4}[\\s-]?\\d{4}[\\s-]?\\d{4}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** IP redaction is doc-only in the reference
    * (docs/TRANSFORM_LAYER_BENEFITS.md:169-171) — included as the
    * [spec-only] surface.
    */
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def redact(c: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      EmailRe -> "[EMAIL_REDACTED]",
      PhoneDashRe -> "[PHONE_REDACTED]",
      PhoneParenRe -> "[PHONE_REDACTED]",
      CardRe -> "[CARD_REDACTED]",
      SsnRe -> "[SSN_REDACTED]")
    steps.foldLeft(c) { case (acc, (re, tok)) => regexp_replace(acc, re, tok) }
  }

  def redactIp(c: Column): Column = regexp_replace(c, IpRe, "[IP_REDACTED]")

  /** The same chain as DuckDB SQL text (global flag required — DuckDB
    * regexp_replace is single-match by default, Spark's is global).
    */
  def redactSql(e: String): String = {
    val steps: Seq[(String, String)] = Seq(
      EmailRe -> "[EMAIL_REDACTED]",
      PhoneDashRe -> "[PHONE_REDACTED]",
      PhoneParenRe -> "[PHONE_REDACTED]",
      CardRe -> "[CARD_REDACTED]",
      SsnRe -> "[SSN_REDACTED]")
    // DuckDB single-quoted literals keep backslashes verbatim, so the
    // Scala-level pattern text passes through unchanged.
    steps.foldLeft(e) { case (acc, (re, tok)) =>
      s"regexp_replace($acc, '$re', '$tok', 'g')"
    }
  }
}
