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
  val PhoneRe = "\\+1-555-[0-9]{4}"
  val IpRe = "10\\.0\\.[0-9]{1,3}\\.1"

  /** Chained redaction: emails, then phones, then IPv4s. */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>")

  /** Per-category match counts over the raw text. */
  def counts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(EmailRe)).cast(LongType).as("n_emails"),
    regexp_count(text, lit(PhoneRe)).cast(LongType).as("n_phones"),
    regexp_count(text, lit(IpRe)).cast(LongType).as("n_ips"))
}
