package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft score` CLI subcommand: parse contract + end-to-end run
  * pinning CLI ≡ the library signal operators it fronts. */
class ScoreCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseScoreArgs: surface, defaults, errors") {
    import Main.parseScoreArgs
    val a = parseScoreArgs(Seq("-i", "/in", "-o", "/out",
      "--min-quality", "0.7", "--flesch", "--entropy", "--filter",
      "--quiet"))
    assert(a.minQuality == 0.7 && a.flesch && a.entropy && a.filterKeep)
    val d = parseScoreArgs(Seq("-i", "/in", "-o", "/out"))
    assert(d.minQuality == 0.5 && !d.flesch && !d.entropy && !d.filterKeep)
    intercept[IllegalArgumentException](parseScoreArgs(Seq("-i", "/in")))
    intercept[IllegalArgumentException](
      parseScoreArgs(Seq("-i", "a", "-o", "b", "--min-quality", "x")))
    // range + NaN validated (the r17 self-review drift fix)
    intercept[IllegalArgumentException](
      parseScoreArgs(Seq("-i", "a", "-o", "b", "--min-quality", "5.0")))
    intercept[IllegalArgumentException](
      parseScoreArgs(Seq("-i", "a", "-o", "b", "--min-quality", "NaN")))
    intercept[Main.CliExit](parseScoreArgs(Seq("--help")))
  }

  test("score --flesch refuses duplicate ids instead of fanning the join out") {
    import spark.implicits._
    val in = tmp("score-dup")
    Seq((1L, "alpha beta gamma."), (1L, "delta epsilon zeta."))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$in/d.parquet")
    val out = tmp("score-dup-out") + "/s.parquet"
    val e = intercept[IllegalArgumentException](Main.runScore(spark,
      Main.ScoreArgs(input = s"$in/d.parquet", outputFile = out,
        flesch = true, quiet = true)))
    assert(e.getMessage.contains("duplicate"))
    // without the joining signals, duplicate ids score row-wise fine
    Main.runScore(spark, Main.ScoreArgs(
      input = s"$in/d.parquet", outputFile = out, quiet = true))
    assert(spark.read.parquet(out).count() == 2L)
  }

  test("score end-to-end: CLI columns ≡ library signals; --filter keeps only keep") {
    val in = TestSpark.sfDir + "/documents.parquet"
    val out = tmp("score-out") + "/scored.parquet"
    Main.runScore(spark, Main.ScoreArgs(
      input = in, outputFile = out, flesch = true, entropy = true,
      quiet = true))
    val docs = spark.read.parquet(in)
    val got = spark.read.parquet(out)
    assert(got.count() == docs.count()) // unfiltered: every row scored
    // quality/keep/predicted_lang ≡ the library chain
    val wantQ = operators.Pipeline.langIdPredict(
      operators.Pipeline.qualityScore(docs, "text"), "text")
      .select("doc_id", "quality", "keep", "predicted_lang").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2),
        r.getString(3))).toMap
    val gotQ = got.select("doc_id", "quality", "keep", "predicted_lang")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2),
        r.getString(3))).toMap
    assert(gotQ == wantQ)
    // flesch/entropy joined per doc, ≡ the gated operators
    val wantF = operators.Pipeline.fleschSignal(docs, "doc_id", "text")
      .select("doc_id", "flesch").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gotF = got.select("doc_id", "flesch").collect()
      .filterNot(_.isNullAt(1)).map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotF == wantF)
    val wantE = operators.Pipeline.charEntropySignal(docs, "doc_id", "text")
      .select("doc_id", "entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gotE = got.select("doc_id", "entropy").collect()
      .filterNot(_.isNullAt(1)).map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotE == wantE)

    // --filter writes only keep = true rows
    val outF = tmp("score-filter") + "/scored.parquet"
    Main.runScore(spark, Main.ScoreArgs(
      input = in, outputFile = outF, filterKeep = true, quiet = true))
    val kept = spark.read.parquet(outF)
    assert(kept.count() == wantQ.values.count(_._2))
    assert(kept.filter(!col("keep")).count() == 0L)

    // derived-column clash fails fast instead of silently overwriting
    val clashDir = tmp("score-clash")
    docs.withColumn("quality", lit(1.0))
      .write.mode("overwrite").parquet(s"$clashDir/d.parquet")
    val e = intercept[IllegalArgumentException](Main.runScore(spark,
      Main.ScoreArgs(input = s"$clashDir/d.parquet",
        outputFile = outF, quiet = true)))
    assert(e.getMessage.contains("quality"))
  }
}
