package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft audit` CLI subcommand: parse contract + end-to-end runs
  * pinning CLI ≡ [[graft.operators.Relational.checkConstraints]]
  * (never a reimplementation — the WarehouseCliSpec shape), plus the
  * `--fail-on-violation` CI-gate contract. */
class AuditCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseAuditArgs: surface, defaults, spec grammars, errors") {
    import Main.parseAuditArgs
    val a = parseAuditArgs(Seq("-i", "/in", "-o", "/out",
      "--not-null", "k", "--unique", "k,tie", "--range", "q:0:50",
      "--in-set", "f:A,B", "--ref", "k=/dim:dk", "--quiet"))
    assert(a.input == "/in" && a.outputFile == "/out" &&
      a.notNull == Seq("k") && a.unique == Seq(Seq("k", "tie")) &&
      a.ranges == Seq(("q", 0.0, 50.0)) &&
      a.inSets == Seq(("f", Seq("A", "B"))) &&
      a.refs == Seq((Seq("k"), "/dim", Seq("dk"))) &&
      a.quiet && !a.failOnViolation)
    // a dim DIR containing ':' splits at the LAST ':'
    val b = parseAuditArgs(Seq("-i", "/in", "-o", "/out",
      "--ref", "a,b=hdfs://nn:9000/dim:x,y", "--fail-on-violation"))
    assert(b.refs == Seq((Seq("a", "b"), "hdfs://nn:9000/dim",
      Seq("x", "y"))) && b.failOnViolation)
    // grammar errors are loud
    assert(intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-i", "/in", "-o", "/out", "--range", "q:0")))
      .getMessage.contains("--range"))
    assert(intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-i", "/in", "-o", "/out", "--range", "q:lo:hi")))
      .getMessage.contains("doubles"))
    assert(intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-i", "/in", "-o", "/out", "--range", "q:9:1")))
      .getMessage.contains("lower bound"))
    // NaN parses as a double but every comparison is false — the check
    // would silently never fire
    assert(intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-i", "/in", "-o", "/out", "--range", "q:NaN:1")))
      .getMessage.contains("NaN"))
    // empty in-set tokens: interior ones filtered, all-empty loud
    assert(parseAuditArgs(Seq("-i", "/in", "-o", "/out",
      "--in-set", "f:en,,de")).inSets == Seq(("f", Seq("en", "de"))))
    assert(intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-i", "/in", "-o", "/out", "--in-set", "f:,")))
      .getMessage.contains("non-empty value"))
    assert(intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-i", "/in", "-o", "/out", "--in-set", "f")))
      .getMessage.contains("--in-set"))
    assert(intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-i", "/in", "-o", "/out", "--ref", "a=/dim")))
      .getMessage.contains("--ref"))
    assert(intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-i", "/in", "-o", "/out", "--ref", "a,b=/dim:x")))
      .getMessage.contains("counts differ"))
    // at least one constraint; both paths required; unknown flag; help
    assert(intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-i", "/in", "-o", "/out")))
      .getMessage.contains("at least one constraint"))
    intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-o", "/out", "--not-null", "k")))
    intercept[IllegalArgumentException](parseAuditArgs(
      Seq("-i", "/in", "-o", "/out", "--nope")))
    intercept[Main.CliExit](parseAuditArgs(Seq("--help")))
  }

  test("audit end-to-end ≡ Relational.checkConstraints; missing columns " +
      "and unreadable dims fail at validation; --fail-on-violation names " +
      "the failed checks after writing the report") {
    import spark.implicits._
    import operators.Relational._
    val in = tmp("audit-in")
    val dimDir = tmp("audit-dim")
    val rows = Seq(
      (Some(1L), Some(10.0), Some("A")),
      (Some(1L), Some(99.0), Some("X")),
      (None, None, None),
      (Some(2L), Some(5.0), Some("B")))
    rows.toDF("k", "q", "f").write.mode("overwrite").parquet(in)
    Seq(1L).toDF("dk").write.mode("overwrite").parquet(dimDir)
    val out = tmp("audit-out") + "/report.parquet"
    val n = Main.runAudit(spark, Main.AuditArgs(
      input = in, outputFile = out, notNull = Seq("k"),
      unique = Seq(Seq("k")), ranges = Seq(("q", 0.0, 50.0)),
      inSets = Seq(("f", Seq("A", "B"))),
      refs = Seq((Seq("k"), dimDir, Seq("dk"))), quiet = true))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("check_type"),
        r.getAs[String]("target"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed"))).toSet
    val want = canon(checkConstraints(rows.toDF("k", "q", "f"), Seq(
      NotNull("k"), Unique(Seq("k")), InRange("q", lit(0.0), lit(50.0)),
      InSet("f", Seq("A", "B")),
      RefIntegrity(Seq("k"), Seq(1L).toDF("dk"), Seq("dk")))))
    assert(n == 5L && canon(spark.read.parquet(out)) == want)

    // CI gate: raises naming every failed check, report written first
    val out2 = tmp("audit-out2") + "/report.parquet"
    val e = intercept[IllegalArgumentException](Main.runAudit(spark,
      Main.AuditArgs(input = in, outputFile = out2,
        notNull = Seq("k"), unique = Seq(Seq("k")),
        failOnViolation = true, quiet = true)))
    assert(e.getMessage.contains("audit failed") &&
      e.getMessage.contains("not_null(k)") &&
      e.getMessage.contains("unique(k)"))
    assert(spark.read.parquet(out2).count() == 2L)

    // validation errors
    assert(intercept[IllegalArgumentException](Main.runAudit(spark,
      Main.AuditArgs(input = in, outputFile = out,
        notNull = Seq("nope")))).getMessage.contains("--not-null"))
    assert(intercept[IllegalArgumentException](Main.runAudit(spark,
      Main.AuditArgs(input = in, outputFile = out,
        refs = Seq((Seq("k"), "/no/such/dir", Seq("dk"))))))
      .getMessage.contains("--ref"))
    assert(intercept[IllegalArgumentException](Main.runAudit(spark,
      Main.AuditArgs(input = "/no/such/dir", outputFile = out,
        notNull = Seq("k")))).getMessage.contains("--input"))
  }
}
