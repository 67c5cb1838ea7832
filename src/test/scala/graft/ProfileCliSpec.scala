package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The `graft profile` CLI subcommand: parse contract + an end-to-end
  * run pinning every report section ≡ the library operator it fronts
  * ([[graft.operators.Pipeline.ngramDupProfile]] / `zipfSlope` /
  * `paddingWasteReport` / `vocabGrowth`). */
class ProfileCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseProfileArgs: surface, defaults, errors") {
    import Main.parseProfileArgs
    val a = parseProfileArgs(Seq("-i", "/in", "-o", "/out",
      "--ns", "2, 3,5", "--batch-size", "16", "--top-k", "50",
      "--buckets", "4", "--quiet"))
    assert(a.ns == Seq(2, 3, 5) && a.batchSize == 16 &&
      a.topK == 50 && a.buckets == 4 && a.quiet)
    val d = parseProfileArgs(Seq("-i", "/in", "-o", "/out"))
    assert(d.ns == Seq(1, 2, 4, 8) && d.batchSize == 32 &&
      d.topK == 100 && d.buckets == 10 && !d.approx)
    assert(parseProfileArgs(Seq("-i", "/in", "-o", "/out",
      "--approx")).approx)

    intercept[IllegalArgumentException](parseProfileArgs(Seq("-i", "/in")))
    intercept[IllegalArgumentException](parseProfileArgs(
      Seq("-i", "a", "-o", "b", "--ns", "2,x")))
    intercept[IllegalArgumentException](parseProfileArgs(
      Seq("-i", "a", "-o", "b", "--ns", "2,2")))
    intercept[IllegalArgumentException](parseProfileArgs(
      Seq("-i", "a", "-o", "b", "--ns", "0,2")))
    intercept[IllegalArgumentException](parseProfileArgs(
      Seq("-i", "a", "-o", "b", "--top-k", "1")))
    intercept[Main.CliExit](parseProfileArgs(Seq("--help")))
  }

  test("profile end-to-end: every section ≡ its library operator") {
    val in = TestSpark.sfDir + "/documents.parquet"
    val out = tmp("profile-out")
    val stats = Main.runProfile(spark, Main.ProfileArgs(
      input = in, outputDir = out, ns = Seq(1, 3), batchSize = 16,
      topK = 20, buckets = 5, quiet = true))
    assert(stats.keySet ==
      Set("dup_profile", "zipf", "padding", "growth"))

    val docs = spark.read.parquet(in)
    val P = operators.Pipeline
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet

    assert(rows(spark.read.parquet(s"$out/dup_profile.parquet")) ==
      rows(P.ngramDupProfile(docs, "text", Seq(1, 3))))
    assert(rows(spark.read.parquet(s"$out/zipf.parquet")) ==
      rows(P.zipfSlope(docs, "text", topK = 20)))
    assert(rows(spark.read.parquet(s"$out/padding.parquet")) ==
      rows(P.paddingWasteReport(
        docs.select(col("doc_id"),
          coalesce(size(array_remove(split(col("text"), "\\s+"), ""))
            .cast(LongType), lit(0L)).as("n_tok")),
        "doc_id", "n_tok", batchSize = 16)))
    assert(rows(spark.read.parquet(s"$out/growth.parquet")) ==
      rows(P.vocabGrowth(docs, "doc_id", "text", buckets = 5)))
    // --approx routes the HLL mode through to the dup_profile section
    val outA = tmp("profile-approx")
    Main.runProfile(spark, Main.ProfileArgs(input = in,
      outputDir = outA, ns = Seq(1, 3), approx = true, batchSize = 16,
      topK = 20, buckets = 5, quiet = true))
    assert(rows(spark.read.parquet(s"$outA/dup_profile.parquet")) ==
      rows(P.ngramDupProfile(docs, "text", Seq(1, 3), approx = true)))
    // a non-integral id fails fast (the padding section ranks on it)
    val strId = tmp("profile-str")
    docs.select(col("doc_id").cast("string").as("doc_id"), col("text"))
      .write.mode("overwrite").parquet(strId)
    assert(intercept[IllegalArgumentException](
      Main.runProfile(spark, Main.ProfileArgs(input = strId,
        outputDir = tmp("x"), quiet = true)))
      .getMessage.contains("integral"))
  }
}
