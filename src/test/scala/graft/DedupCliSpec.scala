package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft dedup` CLI subcommand: parse contract + end-to-end runs
  * pinning CLI ≡ the library chain it fronts
  * ([[graft.operators.Pipeline.dedupChainManaged]] /
  * [[graft.operators.Pipeline.exactDedup]] — never a
  * reimplementation), the CurateCliSpec shape. */
class DedupCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseDedupArgs: full surface, defaults, errors") {
    import Main.parseDedupArgs
    val a = parseDedupArgs(Seq("-i", "/in", "-o", "/out",
      "--id-column", "id", "--text-column", "body",
      "--jaccard-min", "0.8", "--bands", "16", "--rows", "2",
      "--report-file", "/rep", "--compression", "snappy",
      "--multi-file", "--partition-by", "lang", "--quiet"))
    assert(a.input == "/in" && a.outputFile == "/out")
    assert(a.idColumn == "id" && a.textColumn == "body")
    assert(a.mode == "near" && a.jaccardMin == 0.8)
    assert(a.bands == 16 && a.rows == 2)
    assert(a.reportFile.contains("/rep"))
    assert(a.compression == "snappy" && a.multiFile && a.quiet)
    assert(a.partitionBy == Seq("lang"))
    // CLI defaults must equal the library defaults the chain uses
    val d = parseDedupArgs(Seq("-i", "/in", "-o", "/out"))
    assert(d.jaccardMin == 0.5 && d.bands == 8 && d.rows == 4)

    intercept[IllegalArgumentException](parseDedupArgs(Seq("-i", "/in")))
    intercept[IllegalArgumentException](parseDedupArgs(Seq("--nope")))
    intercept[IllegalArgumentException](
      parseDedupArgs(Seq("-i", "a", "-o", "b", "--mode", "fuzzy")))
    intercept[IllegalArgumentException](
      parseDedupArgs(Seq("-i", "a", "-o", "b", "--jaccard-min", "0")))
    intercept[IllegalArgumentException](
      parseDedupArgs(Seq("-i", "a", "-o", "b", "--jaccard-min", "x")))
    // near-layer knobs must not silently no-op under --mode exact
    val e = intercept[IllegalArgumentException](
      parseDedupArgs(Seq("-i", "a", "-o", "b", "--mode", "exact",
        "--report-file", "/rep", "--bands", "16")))
    assert(e.getMessage.contains("--report-file") &&
      e.getMessage.contains("--bands"))
    intercept[Main.CliExit](parseDedupArgs(Seq("--help")))
  }

  test("dedup end-to-end: CLI output ≡ dedupChainManaged, report ≡ dedupReport") {
    val in = TestSpark.sfDir + "/documents.parquet"
    val out = tmp("dedup-out") + "/deduped.parquet"
    val rep = tmp("dedup-rep") + "/report.parquet"
    val stats = Main.runDedup(spark, Main.DedupArgs(
      input = in, outputFile = out, reportFile = Some(rep), quiet = true))

    val chain = operators.Pipeline.dedupChainManaged(
      spark.read.parquet(in), "doc_id", "text")
    try {
      val wantIds = chain.deduped.select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val gotIds = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(gotIds == wantIds && stats.rows == wantIds.size.toLong)
      // the near layer actually removed something at fixture scale
      val nIn = spark.read.parquet(in).count()
      assert(gotIds.size < nIn.toInt)
      val wantRep = chain.report.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val gotRep = spark.read.parquet(rep).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(gotRep == wantRep && wantRep.nonEmpty)
    } finally chain.release()
  }

  test("dedup --mode exact ≡ Pipeline.exactDedup; bad input one-line error") {
    val in = TestSpark.sfDir + "/documents.parquet"
    val out = tmp("dedup-exact") + "/deduped.parquet"
    Main.runDedup(spark, Main.DedupArgs(
      input = in, outputFile = out, mode = "exact", quiet = true))
    val want = operators.Pipeline.exactDedup(
      spark.read.parquet(in), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == want)

    val e1 = intercept[IllegalArgumentException](Main.runDedup(spark,
      Main.DedupArgs(input = "/nope", outputFile = out)))
    assert(e1.getMessage.startsWith("cannot read --input"))
    val e2 = intercept[IllegalArgumentException](Main.runDedup(spark,
      Main.DedupArgs(input = in, outputFile = out, textColumn = "body")))
    assert(e2.getMessage.contains("--text-column"))
  }
}
