package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft linkage` CLI subcommand: parse contract + an end-to-end
  * run pinning CLI ≡ [[graft.operators.Pipeline.blockedRecordLinkage]]
  * (never a reimplementation), the DedupCliSpec shape. */
class LinkageCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseLinkageArgs: surface, defaults, errors") {
    import Main.parseLinkageArgs
    val a = parseLinkageArgs(Seq("-i", "/in", "-o", "/out",
      "--id-column", "uid", "--block-column", "region",
      "--block-column", "zip", "--field-column", "full_name",
      "--max-dist", "1", "--block-cap", "50",
      "--compression", "snappy", "--multi-file",
      "--partition-by", "region", "--quiet"))
    assert(a.input == "/in" && a.outputFile == "/out" && a.idColumn == "uid")
    assert(a.blockColumns == Seq("region", "zip") &&
      a.fieldColumn == "full_name")
    assert(a.maxDist == 1 && a.blockCap == 50)
    assert(a.compression == "snappy" && a.multiFile && a.quiet)
    // defaults match the library's
    val d = parseLinkageArgs(Seq("-i", "/in", "-o", "/out",
      "--block-column", "b", "--field-column", "f"))
    assert(d.idColumn == "doc_id" && d.maxDist == 2 && d.blockCap == 1000)

    intercept[IllegalArgumentException](parseLinkageArgs(
      Seq("-i", "/in", "-o", "/out", "--field-column", "f"))) // no block col
    intercept[IllegalArgumentException](parseLinkageArgs(
      Seq("-i", "/in", "-o", "/out", "--block-column", "b"))) // no field col
    intercept[IllegalArgumentException](parseLinkageArgs(
      Seq("-i", "a", "-o", "b", "--block-column", "c",
        "--field-column", "f", "--max-dist", "-1")))
    intercept[IllegalArgumentException](parseLinkageArgs(Seq("--nope")))
    intercept[Main.CliExit](parseLinkageArgs(Seq("--help")))
  }

  test("linkage run ≡ blockedRecordLinkage on the customer table; " +
    "missing column fails at read validation") {
    val sf = TestSpark.sfDir
    val in = sf + "/customer.parquet"
    val out = tmp("linkage-out") + "/pairs.parquet"
    val stats = Main.runLinkage(spark, Main.LinkageArgs(
      input = in, outputFile = out, idColumn = "c_custkey",
      blockColumns = Seq("c_nationkey", "c_mktsegment"),
      fieldColumn = "c_name", maxDist = 2, quiet = true))
    val want = operators.Pipeline.blockedRecordLinkage(
      spark.read.parquet(in), "c_custkey",
      Seq("c_nationkey", "c_mktsegment"), "c_name", maxDist = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist"))).toSet
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist"))).toSet
    assert(got == want && want.nonEmpty)
    assert(stats.rows == want.size.toLong)
    val e = intercept[IllegalArgumentException] {
      Main.runLinkage(spark, Main.LinkageArgs(
        input = in, outputFile = out, idColumn = "c_custkey",
        blockColumns = Seq("no_such_col"), fieldColumn = "c_name",
        quiet = true))
    }
    assert(e.getMessage.contains("no_such_col"))
  }
}
