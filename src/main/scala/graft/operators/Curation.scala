package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Composed training-data curation pipeline: the end-to-end job the
  * pipeline operators exist for — exact-dedup, then quality and
  * language gates, then token accounting — as one declarative
  * DataFrame transform a user applies before writing a curated corpus.
  *
  * Every stage is narrow or a single shuffle: the dedup window
  * partitions on the content hash (one exchange), the gates are
  * per-row filters that Catalyst pushes below the window where legal,
  * and token stats are projections. At 100 TB this runs as one
  * scan + one shuffle + one write.
  */
object Curation {

  final case class CurationConfig(
      langs: Seq[String] = Seq("en", "de", "fr", "es"),
      minChars: Long = 100L,
      minQuality: Double = 0.5,
      maxTokens: Long = 10000L)

  private def ws(c: Column): Column = split(c, "\\s+")

  /** Quality score — delegates to the ONE copy of the p10 formula
    * ([[Pipeline.qualityExpr]]), so p10 and p13 can't drift apart. */
  def qualityScore(text: Column, nChars: Column): Column =
    Pipeline.qualityExpr(text, nChars)

  /** End-to-end TEXT-cleaning chain — the full pre-training scrub a
    * crawl corpus runs before tokenization, composed from the SAME
    * operators the individual gates certify (never re-implemented):
    * C4 line cleaning ([[Pipeline.c4CleanLines]], dropping failed
    * pages) → global paragraph dedup
    * ([[Pipeline.dedupParagraphsGlobal]], boilerplate lines) → exact
    * substring dedup ([[Pipeline.dedupSubstringsGlobal]], Lee'22
    * repeated runs) → optional span-granular eval decontamination
    * ([[Pipeline.decontaminateSpans]]). Each stage feeds the previous
    * stage's cleaned text, so later (more expensive) stages see less
    * data; the chain is scan → map-side line pass → two content-keyed
    * partial-agg shuffles → map-side broadcast probe. Output, one row
    * per SURVIVING page: (doc_id, n_lines, n_kept_lines, n_words,
    * n_cut_words, n_flagged_grams, text_clean). `evalTextCol` names
    * the eval frame's text column (defaults to `textCol`). */
  def cleanText(docs: DataFrame, idCol: String, textCol: String,
      evalSet: Option[DataFrame] = None, substringMinLen: Int = 50,
      decontaminateN: Int = 13, evalTextCol: String = "",
      badwords: Seq[String] = Nil, urlCol: String = "",
      nfc: Boolean = false): DataFrame =
    cleanTextManaged(docs, idCol, textCol, evalSet, substringMinLen,
      decontaminateN, evalTextCol, badwords, urlCol, nfc).frame

  /** Handle over a [[cleanTextManaged]] result: `frame` is the cleaned
    * corpus; `release()` drops the chain's localCheckpoint blocks from
    * the block manager. Call it only AFTER the last action on `frame`
    * (or any frame derived from it) — the lineage reads the blocks.
    * Idempotent; the same discipline as Pipeline.bpeTrain's internal
    * releaseLocalCheckpoint (ADVICE r14: without a release path,
    * repeated one-shot cleans accumulate storage until the session
    * dies). */
  final class CleanTextHandle private[Curation] (val frame: DataFrame,
      checkpointed: DataFrame) {
    def release(): Unit =
      Pipeline.releaseLocalCheckpoint(checkpointed, blocking = true)
  }

  /** [[cleanText]] with an explicit lifetime for the intermediate
    * localCheckpoint — use this form when running MANY cleans in one
    * session: materialize/write `handle.frame`, then `handle.release()`.
    *
    * The two optional pre-stages complete the C4 §2.2 reproduction
    * (both map/one-shuffle shapes, both no-ops by default so the p13
    * gate pins the unextended chain): `urlCol` non-empty → URL-level
    * exact dedup FIRST ([[Pipeline.dedupByUrl]] — the cheapest
    * removal, run before anything text-shaped); `badwords` non-empty →
    * drop pages the blocklist flags ([[Pipeline.badwordsFilter]],
    * whole-word case-insensitive) before line cleaning. */
  def cleanTextManaged(docs: DataFrame, idCol: String, textCol: String,
      evalSet: Option[DataFrame] = None, substringMinLen: Int = 50,
      decontaminateN: Int = 13, evalTextCol: String = "",
      badwords: Seq[String] = Nil, urlCol: String = "",
      nfc: Boolean = false): CleanTextHandle = {
    // optional Unicode NFC FIRST (map-side, before anything
    // content-hashed): mixed-encoder crawls carry the same visible
    // text precomposed and decomposed, and every downstream dedup
    // stage keys on content — normalize before hashing or miss dups.
    // Off by default so the p13-era gates pin the unextended chain.
    val docs0 =
      if (!nfc) docs
      else docs.withColumn(textCol,
        call_function("nfc_normalize", col(textCol)))
    val afterUrl =
      if (urlCol.isEmpty) docs0
      else Pipeline.dedupByUrl(docs0, idCol, urlCol).drop("url_norm")
    val afterBlock =
      if (badwords.isEmpty) afterUrl
      else Pipeline.badwordsFilter(afterUrl, textCol, badwords)
        .filter(!col("blocked")).drop("blocked")
    val c4 = Pipeline.c4CleanLines(afterBlock, idCol, textCol)
      .filter(col("keep"))
      .select(col(idCol).as("doc_id"), col("cleaned_text"))
    // localCheckpoint: `par` feeds BOTH the substring stage (which
    // itself instantiates its input twice — gram table + rebuild base)
    // and the line-counter join below; without materialization
    // Catalyst re-executes the scan + C4 pass + the paragraph dedup's
    // two shuffles up to three times. Via plain [[cleanText]] the
    // blocks live until the session ends (the returned frame reads
    // them); [[cleanTextManaged]]'s handle releases them.
    val par = Pipeline
      .dedupParagraphsGlobal(c4, "doc_id", "cleaned_text")
      .localCheckpoint()
    val sub = Pipeline.dedupSubstringsGlobal(
        par.select(col("doc_id"), col("text_deduped")),
        "doc_id", "text_deduped", minLen = substringMinLen)
      .select(col("doc_id"), col("n_words"), col("n_cut_words"),
        col("text_deduped"))
    val joined = par.select(col("doc_id"), col("n_lines"),
        col("n_kept_lines"))
      .join(sub, Seq("doc_id"))
    val evCol = if (evalTextCol.isEmpty) textCol else evalTextCol
    val out = (evalSet match {
      case Some(es) =>
        Pipeline.decontaminateSpans(joined, es, "text_deduped",
          n = decontaminateN, evalTextCol = evCol)
      case None =>
        joined.withColumn("n_flagged_grams", lit(0L))
          .withColumn("text_clean", col("text_deduped"))
    }).select(col("doc_id"), col("n_lines"), col("n_kept_lines"),
      col("n_words"), col("n_cut_words"), col("n_flagged_grams"),
      col("text_clean"))
    new CleanTextHandle(out, par)
  }

  /** documents → curated corpus rows (kept docs + token accounting).
    * The dedup stage IS [[Pipeline.exactDedup]] (the p01 operator) —
    * same min-id-per-content-hash window, not a re-implementation. */
  def curate(docs: DataFrame, cfg: CurationConfig = CurationConfig()): DataFrame =
    Pipeline.exactDedup(docs, "doc_id", "text")
      .filter(col("lang").isin(cfg.langs.map(l => l: Any): _*))
      .filter(col("n_chars") >= cfg.minChars)
      .withColumn("quality", qualityScore(col("text"), col("n_chars")))
      .filter(col("quality") >= cfg.minQuality)
      .withColumn("n_tokens", size(ws(col("text"))).cast(LongType))
      .filter(col("n_tokens") <= cfg.maxTokens)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("n_tokens"), col("quality"))
}
