package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `graft graph` CLI subcommand: parse contract + end-to-end runs
  * pinning CLI ≡ [[graft.operators.Pipeline.pageRankFixedPoint]] /
  * [[graft.operators.Pipeline.degreeProfile]] per mode (never a
  * reimplementation — the WarehouseCliSpec shape). */
class GraphCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseGraphArgs: surface, defaults, cross-mode flags loud, errors") {
    import Main.parseGraphArgs
    val a = parseGraphArgs(Seq("-i", "/e", "-o", "/out",
      "--src-column", "u", "--dst-column", "v", "--iterations", "3",
      "--damping-pct", "90", "--scale", "1000000", "--quiet"))
    assert(a.mode == "pagerank" && a.srcColumn == "u" &&
      a.dstColumn == "v" && a.iterations == 3 && a.dampingPct == 90 &&
      a.scale == 1000000L && a.quiet)
    val d = parseGraphArgs(Seq("--mode", "degrees", "-i", "/e",
      "-o", "/out"))
    assert(d.mode == "degrees" && d.srcColumn == "src" &&
      d.dstColumn == "dst")
    // pagerank flags under degrees are loud, not silently ignored
    assert(intercept[IllegalArgumentException](parseGraphArgs(
      Seq("--mode", "degrees", "-i", "/e", "-o", "/out",
        "--iterations", "5"))).getMessage.contains("no effect"))
    intercept[IllegalArgumentException](parseGraphArgs(
      Seq("--mode", "nope", "-i", "/e", "-o", "/out")))
    intercept[IllegalArgumentException](parseGraphArgs(
      Seq("-i", "/e", "-o", "/out", "--iterations", "x")))
    intercept[IllegalArgumentException](parseGraphArgs(
      Seq("-i", "/e", "-o", "/out", "--scale", "x")))
    intercept[IllegalArgumentException](parseGraphArgs(Seq("-o", "/out")))
    intercept[IllegalArgumentException](parseGraphArgs(Seq("--nope")))
    intercept[Main.CliExit](parseGraphArgs(Seq("--help")))
  }

  test("graph pagerank / degrees ≡ the library operators; bad columns " +
      "and library guards surface as CLI errors") {
    import spark.implicits._
    val in = tmp("graph-in")
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 5L))
    es.toDF("u", "v").write.mode("overwrite").parquet(in)
    val out = tmp("graph-out") + "/ranks.parquet"
    val n = Main.runGraph(spark, Main.GraphArgs(input = in,
      outputFile = out, srcColumn = "u", dstColumn = "v",
      iterations = 3, quiet = true))
    val want = operators.Pipeline
      .pageRankFixedPoint(es.toDF("u", "v"), "u", "v", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getAs[Long]("node"),
        r.getAs[Long]("rank_fp"))).toSet
    assert(n == 5L && got == want)

    val out2 = tmp("graph-out2") + "/degrees.parquet"
    val n2 = Main.runGraph(spark, Main.GraphArgs(mode = "degrees",
      input = in, outputFile = out2, srcColumn = "u", dstColumn = "v",
      quiet = true))
    val want2 = operators.Pipeline
      .degreeProfile(es.toDF("u", "v"), "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got2 = spark.read.parquet(out2)
      .collect().map(r => (r.getAs[Long]("node"),
        r.getAs[Long]("out_deg"), r.getAs[Long]("in_deg"))).toSet
    assert(n2 == 5L && got2 == want2)

    assert(intercept[IllegalArgumentException](Main.runGraph(spark,
      Main.GraphArgs(input = in, outputFile = out, srcColumn = "nope",
        dstColumn = "v", quiet = true)))
      .getMessage.contains("--src-column"))
    assert(intercept[IllegalArgumentException](Main.runGraph(spark,
      Main.GraphArgs(input = "/no/such/dir", outputFile = out,
        quiet = true))).getMessage.contains("--input"))
    // a library guard (scale bounds) surfaces as a CLI usage error
    assert(intercept[IllegalArgumentException](Main.runGraph(spark,
      Main.GraphArgs(input = in, outputFile = out, srcColumn = "u",
        dstColumn = "v", scale = 1L, quiet = true)))
      .getMessage.contains("scale"))
  }
}
