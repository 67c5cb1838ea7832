package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft split` CLI subcommand: parse contract + end-to-end run
  * pinning CLI ≡ the library chain it fronts
  * ([[graft.operators.Pipeline.leakageSafeSplit]] over
  * [[graft.operators.Pipeline.minhashNeardupPairs]]). */
class SplitCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseSplitArgs: surface, defaults, errors") {
    import Main.parseSplitArgs
    val a = parseSplitArgs(Seq("-i", "/in", "-o", "/out",
      "--train-buckets", "7", "--val-buckets", "2",
      "--jaccard-min", "0.7", "--bands", "16", "--rows", "2", "--quiet"))
    assert(a.trainBuckets == 7 && a.valBuckets == 2)
    assert(a.jaccardMin == 0.7 && a.bands == 16 && a.rows == 2 && a.quiet)
    val d = parseSplitArgs(Seq("-i", "/in", "-o", "/out"))
    assert(d.trainBuckets == 8 && d.valBuckets == 1 &&
      d.jaccardMin == 0.5 && d.bands == 8 && d.rows == 4)

    intercept[IllegalArgumentException](parseSplitArgs(Seq("-i", "/in")))
    // the splitByComponents tenths contract is enforced at parse time
    intercept[IllegalArgumentException](parseSplitArgs(
      Seq("-i", "a", "-o", "b", "--train-buckets", "9", "--val-buckets", "1")))
    intercept[IllegalArgumentException](parseSplitArgs(
      Seq("-i", "a", "-o", "b", "--val-buckets", "-1")))
    intercept[Main.CliExit](parseSplitArgs(Seq("--help")))
  }

  test("split end-to-end: CLI ≡ leakageSafeSplit; near-dup pairs never straddle") {
    val in = TestSpark.sfDir + "/documents.parquet"
    val out = tmp("split-out") + "/split.parquet"
    Main.runSplit(spark, Main.SplitArgs(
      input = in, outputFile = out, quiet = true))
    val got = spark.read.parquet(out)
      .select("doc_id", "component", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

    val docs = spark.read.parquet(in)
    val want = operators.Pipeline.leakageSafeSplit(docs, "doc_id",
      operators.Pipeline.minhashNeardupPairs(docs, "doc_id", "text"))
      .select("doc_id", "component", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got == want && got.nonEmpty)
    // the leakage guarantee, re-checked on the CLI output itself:
    // every member of a component carries the SAME split
    val byComp = got.values.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byComp.values.forall(_.size == 1))
    // all three splits are populated at fixture scale
    assert(got.values.map(_._2).toSet == Set("train", "val", "test"))
  }
}
