package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft tokenize` CLI subcommand: parse contract + end-to-end
  * runs pinning CLI ≡ the library chain it fronts (bpeTrain →
  * bpeVocab → bpeEncodeIds → packTokenIds). */
class TokenizeCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseTokenizeArgs: surface, defaults, errors") {
    import Main.parseTokenizeArgs
    val a = parseTokenizeArgs(Seq("-i", "/in", "-o", "/out",
      "--merges", "50", "--min-pair-count", "3",
      "--merges-file", "/m", "--vocab-file", "/v",
      "--pack", "128", "--shard-column", "src", "--sep-id", "-7",
      "--quiet"))
    assert(a.merges == 50 && a.minPairCount == 3)
    assert(a.mergesFile.contains("/m") && a.vocabFile.contains("/v"))
    assert(a.pack.contains(128) && a.shardColumn.contains("src"))
    assert(a.sepId == -7 && a.quiet)
    val d = parseTokenizeArgs(Seq("-i", "/in", "-o", "/out"))
    assert(d.merges == 1000 && d.minPairCount == 2 && d.sepId == -1 &&
      d.pack.isEmpty)

    intercept[IllegalArgumentException](parseTokenizeArgs(Seq("-i", "/in")))
    intercept[IllegalArgumentException](
      parseTokenizeArgs(Seq("-i", "a", "-o", "b", "--merges", "0")))
    intercept[IllegalArgumentException](
      parseTokenizeArgs(Seq("-i", "a", "-o", "b", "--sep-id", "x")))
    // --shard-column without --pack must not silently no-op
    intercept[IllegalArgumentException](
      parseTokenizeArgs(Seq("-i", "a", "-o", "b", "--shard-column", "s")))
    intercept[Main.CliExit](parseTokenizeArgs(Seq("--help")))
  }

  test("tokenize end-to-end: CLI ids ≡ library chain; artifacts written") {
    import spark.implicits._
    val in = tmp("tok-in")
    val corpus = Seq(
      (1L, "low lower lowest slow slower"),
      (2L, "low low slow slowest lower"),
      (3L, "newer newest new low slow"))
      .toDF("doc_id", "text")
    corpus.write.mode("overwrite").parquet(s"$in/docs.parquet")
    val out = tmp("tok-out") + "/ids.parquet"
    val mf = tmp("tok-m") + "/merges.parquet"
    val vf = tmp("tok-v") + "/vocab.parquet"
    Main.runTokenize(spark, Main.TokenizeArgs(
      input = s"$in/docs.parquet", outputFile = out, merges = 20,
      mergesFile = Some(mf), vocabFile = Some(vf), quiet = true))

    val docs = spark.read.parquet(s"$in/docs.parquet")
    val merges = operators.Pipeline.bpeTrain(docs, "text", 20, 2L)
    val vocab = operators.Pipeline.bpeVocab(docs, "text", merges)
    val want = operators.Pipeline.bpeEncodeIds(docs, "text", merges, vocab)
      .select(col("doc_id"), col("bpe_ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("bpe_ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(got == want && got.nonEmpty)
    assert(got.values.forall(ids => ids.nonEmpty && ids.forall(_ >= 0)))
    // the persisted artifacts round-trip through parquet
    val mrows = spark.read.parquet(mf).collect()
    assert(mrows.nonEmpty)
    val vrows = spark.read.parquet(vf).collect()
    assert(vrows.nonEmpty)

    // derived-column clash fails fast instead of silently overwriting
    val clashDir = tmp("tok-clash")
    docs.withColumn("bpe_ids", lit("x"))
      .write.mode("overwrite").parquet(s"$clashDir/d.parquet")
    val e = intercept[IllegalArgumentException](Main.runTokenize(spark,
      Main.TokenizeArgs(input = s"$clashDir/d.parquet",
        outputFile = out, merges = 5, quiet = true)))
    assert(e.getMessage.contains("bpe_ids"))
  }

  test("tokenize --pack: chunk stream conserves every id + one separator per doc") {
    import spark.implicits._
    val in = tmp("tokp-in")
    val corpus = (1L to 20L)
      .map(i => (i, Seq.fill(5)(s"w${i % 4}").mkString(" ")))
      .toDF("doc_id", "text")
    corpus.write.mode("overwrite").parquet(s"$in/docs.parquet")
    val out = tmp("tokp-out") + "/chunks.parquet"
    Main.runTokenize(spark, Main.TokenizeArgs(
      input = s"$in/docs.parquet", outputFile = out, merges = 5,
      pack = Some(8), quiet = true))
    val chunks = spark.read.parquet(out)
      .select(col("chunk_id"), col("ids")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList)
    assert(chunks.nonEmpty)
    // conservation: the packed stream is exactly all ids + 20 separators
    val docs = spark.read.parquet(s"$in/docs.parquet")
    val merges = operators.Pipeline.bpeTrain(docs, "text", 5, 2L)
    val vocab = operators.Pipeline.bpeVocab(docs, "text", merges)
    val totalIds = operators.Pipeline
      .bpeEncodeIds(docs, "text", merges, vocab)
      .agg(sum(size(col("bpe_ids")))).collect().head.getLong(0)
    assert(chunks.map(_._2.size).sum == totalIds + 20)
    assert(chunks.map(_._2.count(_ == -1)).sum == 20)
    // every chunk but possibly the last is exactly L-full
    val full = chunks.sortBy(_._1).map(_._2.size)
    assert(full.init.forall(_ == 8))
  }
}
