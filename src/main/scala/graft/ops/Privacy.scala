package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: redact e-mail addresses,
  * phone numbers, and IPv4 addresses with typed placeholder tokens, and
  * count what was redacted per document.
  *
  * Pure projection — every pattern is a codegen'd `regexp_replace` /
  * `regexp_count` over the row, no shuffle, so the operator is
  * embarrassingly parallel at any corpus scale and composes with the rest
  * of the curation pipeline (quality gate → PII scrub → dedup) without
  * adding a stage boundary.
  *
  * The patterns are deliberately RE2-compatible (character classes,
  * bounded repetition, `\b` — no backreferences or lookaround) so an
  * independent engine can replay the scrub byte-for-byte: redaction order
  * is e-mail → phone → IPv4, each pass counting on the previous pass's
  * output, which makes the counts unambiguous even when patterns could
  * overlap inside a single span.
  */
object Privacy {

  /** E-mail: local part `@` dotted domain with an alphabetic TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style dashed phone number (NNN-NNN-NNNN). */
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (syntactic — octet range is not validated, matching
    * the common scrubber behavior of over-redacting rather than leaking). */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val EmailToken = "[EMAIL]"
  val PhoneToken = "[PHONE]"
  val IpToken = "[IP]"

  /** Appends `n_emails`, `n_phones`, `n_ips`, and `redacted` (the scrubbed
    * text). Counts reflect the sequential scrub: phones are counted after
    * e-mails are gone, IPs after both — so a span can only ever be
    * redacted (and counted) once. */
  def redactPii(df: DataFrame, text: Column): DataFrame = {
    val t0 = coalesce(text, lit(""))
    val t1 = regexp_replace(t0, EmailRe, EmailToken)
    val t2 = regexp_replace(t1, PhoneRe, PhoneToken)
    val t3 = regexp_replace(t2, Ipv4Re, IpToken)
    df.withColumn("n_emails", regexp_count(t0, lit(EmailRe)))
      .withColumn("n_phones", regexp_count(t1, lit(PhoneRe)))
      .withColumn("n_ips", regexp_count(t2, lit(Ipv4Re)))
      .withColumn("redacted", t3)
  }
}
