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

  /** Quality score shared with p10 (fixed-order double formula). */
  def qualityScore(text: Column, nChars: Column): Column = {
    val w = ws(text)
    val nWords = size(w).cast(DoubleType)
    val stopRatio = size(filter(w, x =>
      x.isin("the", "a", "of", "and", "is"))).cast(DoubleType) / nWords
    val punctRatio = (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
      .cast(DoubleType) / length(text).cast(DoubleType)
    val diversity = size(array_distinct(w)).cast(DoubleType) / nWords
    least(nChars.cast(DoubleType) / 500.0, lit(1.0)) * 0.4 +
      stopRatio * 0.2 + (lit(1.0) - punctRatio) * 0.2 + diversity * 0.2
  }

  /** documents → curated corpus rows (kept docs + token accounting). */
  def curate(docs: DataFrame, cfg: CurationConfig = CurationConfig()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dedupW = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    docs
      .withColumn("content_hash", md5(col("text")))
      .withColumn("dup_rank", row_number().over(dedupW))
      .filter(col("dup_rank") === 1) // keep min doc_id per content
      .filter(col("lang").isin(cfg.langs.map(l => l: Any): _*))
      .filter(col("n_chars") >= cfg.minChars)
      .withColumn("quality", qualityScore(col("text"), col("n_chars")))
      .filter(col("quality") >= cfg.minQuality)
      .withColumn("n_tokens", size(ws(col("text"))).cast(LongType))
      .filter(col("n_tokens") <= cfg.maxTokens)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("n_tokens"), col("quality"))
  }
}
