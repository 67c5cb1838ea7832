package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII detection/redaction expressions shared by the batch operator
  * (p20 in [[Pipeline]]) and the streaming ingest gate
  * ([[graft.streaming.Streams.scrubAndGate]]). Pure map-side Columns —
  * no state, no shuffle — so the identical transform serves `read` and
  * `readStream`. All patterns stay in the portable common ground of
  * Java regex (Spark) and RE2 (the DuckDB oracle): character classes,
  * bounded repetition, and ASCII word boundaries only — no lookaround.
  *
  * Two packs ship: [[FixturePatterns]] (the frozen p20 oracle contract
  * — shapes scoped to the synthetic corpus) and [[DefaultPatterns]]
  * (a production starting point: general emails, international/US
  * phones, any IPv4, SSN- and payment-card-shaped digit groups).
  * Callers with their own compliance surface pass their own pack —
  * every entry point takes `Seq[PiiPattern]`.
  */
object PiiScrub {

  /** One chained redaction pass: `re` replaced by `tag`. Order in the
    * pack matters — each pass sees the previous passes' output — so
    * packs list the most specific shapes first (an email whose local
    * part looks like a phone must be consumed by the email pass). */
  final case class PiiPattern(name: String, re: String, tag: String)

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // open-ended digit runs: a bounded {4} would match the PREFIX of a
  // longer digit string and redact('+1-555-12345') would leave a stray
  // '5' behind (RE2 has no lookaround to anchor with, so consume the
  // whole run instead)
  val PhoneRe = "\\+1-555-[0-9]{4,}"
  val IpRe = "10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** The p20/fixture pack — FROZEN: the p20 oracle and the streaming
    * gate's batch≡stream equivalence are pinned to these shapes. */
  val FixturePatterns: Seq[PiiPattern] = Seq(
    PiiPattern("email", EmailRe, "<EMAIL>"),
    PiiPattern("phone", PhoneRe, "<PHONE>"),
    PiiPattern("ip", IpRe, "<IP>"))

  /** A production starting point. Most specific first; digit-group
    * shapes are word-bounded so they never fire inside longer runs
    * (a 20-digit id must not lose its middle 16 to the card pass).
    * Recall/precision of PII regexes is a policy decision — treat this
    * pack as a base to extend, not a compliance guarantee. */
  val DefaultPatterns: Seq[PiiPattern] = Seq(
    PiiPattern("email", EmailRe, "<EMAIL>"),
    // 13–19 digit payment-card run, optionally 4-4-4-4 grouped
    PiiPattern("card",
      "\\b[0-9]{4}([- ][0-9]{4}){3}\\b|\\b[0-9]{13,19}\\b", "<CARD>"),
    PiiPattern("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    PiiPattern("ip", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    // +country international form, then separator-grouped local forms.
    // Every alternative ends at (x\d+)?\b: the \b means a match can
    // never stop mid-run inside a longer digit string ('+' + 20 digits
    // must survive whole, not leave stray trailing digits — the same
    // word-bounding the card/ssn shapes carry), and the optional
    // x-extension keeps '555-123-4567x89' redactable — a bare \b after
    // the digits would fail at the digit/'x' boundary and LEAK the
    // whole number (no lookaround in the portable Java∩RE2 subset, so
    // the extension must be consumed, not asserted past). The extension
    // digits are OPEN-ENDED: a bounded {1,6} couldn't consume a 7+
    // digit extension, the \b then failed mid-run, and the ENTIRE
    // number leaked unredacted (ADVICE r10). Residual by design: a run
    // interrupted by any other word char ('4567x12ab') is not
    // phone-shaped and survives whole, like any word-bounded pattern.
    PiiPattern("phone",
      "\\+[0-9]{1,3}[- ]?[0-9]{2,4}[- ]?[0-9]{3,4}[- ]?[0-9]{2,6}(x[0-9]+)?\\b" +
        "|\\([0-9]{3}\\)[- ]?[0-9]{3}[- ][0-9]{4}(x[0-9]+)?\\b" +
        "|\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}(x[0-9]+)?\\b", "<PHONE>"))

  /** Chained redaction over a pattern pack (default: the frozen
    * fixture pack — the p20/batch≡stream contract). */
  def redact(text: Column,
      patterns: Seq[PiiPattern] = FixturePatterns): Column =
    patterns.foldLeft(text)((t, p) => regexp_replace(t, p.re, p.tag))

  /** Per-category match counts over the SAME chained passes as
    * [[redact]]: each category is counted on the text with the prior
    * categories already replaced, so the counts sum to exactly the
    * number of replacements redact performs. (Independent raw-text
    * counts would double-count overlaps — a phone-shaped local part
    * inside an email matches both patterns but is redacted once.)
    * Output columns are named `n_<name>s` per pack entry. */
  def counts(text: Column,
      patterns: Seq[PiiPattern] = FixturePatterns): Seq[Column] = {
    val staged = patterns.scanLeft(text)((t, p) =>
      regexp_replace(t, p.re, p.tag))
    patterns.zip(staged).map { case (p, pre) =>
      regexp_count(pre, lit(p.re)).cast(LongType).as(s"n_${p.name}s") }
  }
}
