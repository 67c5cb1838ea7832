package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII detection/redaction expressions shared by the batch operator
  * (p20 in [[Pipeline]]) and the streaming ingest gate
  * ([[graft.streaming.Streams.scrubAndGate]]). Pure map-side Columns —
  * no state, no shuffle — so the identical transform serves `read` and
  * `readStream`. The patterns are the portable common ground of Java
  * regex (Spark) and RE2 (the DuckDB oracle): character classes and
  * bounded repetition only, no lookaround. */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // open-ended digit runs: a bounded {4} would match the PREFIX of a
  // longer digit string and redact('+1-555-12345') would leave a stray
  // '5' behind (RE2 has no lookaround to anchor with, so consume the
  // whole run instead)
  val PhoneRe = "\\+1-555-[0-9]{4,}"
  val IpRe = "10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Chained redaction: emails, then phones, then IPv4s. */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>")

  /** Per-category match counts over the SAME chained passes as
    * [[redact]]: each category is counted on the text with the prior
    * categories already replaced, so the three counts sum to exactly
    * the number of replacements redact performs. (Independent raw-text
    * counts would double-count overlaps — a phone-shaped local part
    * inside an email matches both patterns but is redacted once.) */
  def counts(text: Column): Seq[Column] = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    Seq(
      regexp_count(text, lit(EmailRe)).cast(LongType).as("n_emails"),
      regexp_count(afterEmail, lit(PhoneRe)).cast(LongType).as("n_phones"),
      regexp_count(afterPhone, lit(IpRe)).cast(LongType).as("n_ips"))
  }
}
