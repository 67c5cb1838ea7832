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
