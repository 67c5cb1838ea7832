package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft warehouse` CLI subcommand: parse contract + end-to-end
  * runs pinning CLI ≡ [[graft.operators.Relational.cdcApply]] /
  * [[graft.operators.Relational.scd2Merge]] per mode (never a
  * reimplementation — the DedupCliSpec shape). */
class WarehouseCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseWarehouseArgs: surface, defaults, cross-mode flags loud, " +
      "required flags per mode") {
    import Main.parseWarehouseArgs
    val a = parseWarehouseArgs(Seq("-i", "/log", "-o", "/out",
      "--key-column", "k", "--seq-column", "ts", "--seq-column", "id",
      "--op-column", "op", "--delete-op", "D", "--quiet"))
    assert(a.mode == "cdc-apply" && a.input == "/log" &&
      a.keyColumns == Seq("k") && a.seqColumns == Seq("ts", "id") &&
      a.opColumn == "op" && a.deleteOp == "D" && a.quiet)
    val s = parseWarehouseArgs(Seq("--mode", "scd2", "--history", "/h",
      "--snapshot", "/s", "-o", "/out", "--key-column", "k",
      "--attr-column", "bal", "--attr-column", "seg",
      "--snapshot-id", "7"))
    assert(s.mode == "scd2" && s.attrColumns == Seq("bal", "seg") &&
      s.snapshotId.contains(7L) && s.fromColumn == "valid_from" &&
      s.toColumn == "valid_to")

    // cross-mode flags are loud, not silently ignored
    assert(intercept[IllegalArgumentException](parseWarehouseArgs(
      Seq("-i", "/log", "-o", "/out", "--key-column", "k",
        "--seq-column", "s", "--op-column", "op", "--snapshot-id", "1")))
      .getMessage.contains("no effect"))
    assert(intercept[IllegalArgumentException](parseWarehouseArgs(
      Seq("--mode", "scd2", "--history", "/h", "--snapshot", "/s",
        "-o", "/out", "--key-column", "k", "--attr-column", "a",
        "--snapshot-id", "1", "--op-column", "op")))
      .getMessage.contains("no effect"))
    // per-mode required flags
    assert(intercept[IllegalArgumentException](parseWarehouseArgs(
      Seq("-i", "/log", "-o", "/out", "--key-column", "k")))
      .getMessage.contains("requires"))
    assert(intercept[IllegalArgumentException](parseWarehouseArgs(
      Seq("--mode", "scd2", "--history", "/h", "-o", "/out",
        "--key-column", "k"))).getMessage.contains("requires"))
    intercept[IllegalArgumentException](parseWarehouseArgs(
      Seq("-o", "/out"))) // no key column
    intercept[IllegalArgumentException](parseWarehouseArgs(
      Seq("--mode", "nope")))
    intercept[IllegalArgumentException](parseWarehouseArgs(
      Seq("-i", "a", "-o", "b", "--key-column", "k", "--seq-column", "s",
        "--op-column", "o", "--snapshot-id", "x", "--mode", "scd2")))
    intercept[IllegalArgumentException](parseWarehouseArgs(Seq("--nope")))
    intercept[Main.CliExit](parseWarehouseArgs(Seq("--help")))
  }

  test("warehouse cdc-apply ≡ Relational.cdcApply; missing column fails " +
      "at read validation") {
    import spark.implicits._
    val in = tmp("wh-cdc-in")
    val log = Seq(
      (1L, 1L, 10L, "insert", "a1"), (1L, 2L, 11L, "update", "a2"),
      (2L, 1L, 12L, "insert", "b1"),
      (3L, 1L, 13L, "insert", "c1"), (3L, 2L, 14L, "delete", "c1"))
    log.toDF("k", "seq", "tie", "op", "val").write
      .mode("overwrite").parquet(in)
    val out = tmp("wh-cdc-out") + "/current.parquet"
    val n = Main.runWarehouse(spark, Main.WarehouseArgs(
      input = in, outputFile = out, keyColumns = Seq("k"),
      seqColumns = Seq("seq", "tie"), opColumn = "op", quiet = true))
    val want = operators.Relational.cdcApply(
      log.toDF("k", "seq", "tie", "op", "val"),
      Seq("k"), Seq("seq", "tie"), "op", "delete")
      .collect().map(r => (r.getLong(0), r.getString(4))).toSet
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("val"))).toSet
    assert(n == 2L && got == want && got == Set((1L, "a2"), (2L, "b1")))
    val e = intercept[IllegalArgumentException](Main.runWarehouse(spark,
      Main.WarehouseArgs(input = in, outputFile = out,
        keyColumns = Seq("nope"), seqColumns = Seq("seq"),
        opColumn = "op", quiet = true)))
    assert(e.getMessage.contains("--key-column"))
  }

  test("warehouse scd2 ≡ Relational.scd2Merge") {
    import spark.implicits._
    val hDir = tmp("wh-scd-h"); val sDir = tmp("wh-scd-s")
    val hist = Seq(
      (1L, 100L, "gold", 0L, Some(1L)),   // closed row passes through
      (1L, 120L, "gold", 1L, None),       // open, changes at snap 2
      (2L, 50L, "basic", 0L, None),       // open, unchanged
      (3L, 70L, "basic", 1L, None))       // open, absent → deletion
    hist.toDF("k", "bal", "seg", "valid_from", "valid_to")
      .write.mode("overwrite").parquet(hDir)
    val snap = Seq((1L, 130L, "gold"), (2L, 50L, "basic"),
      (4L, 10L, "new"))
    snap.toDF("k", "bal", "seg").write.mode("overwrite").parquet(sDir)
    val out = tmp("wh-scd-out") + "/history.parquet"
    val n = Main.runWarehouse(spark, Main.WarehouseArgs(mode = "scd2",
      history = hDir, snapshot = sDir, outputFile = out,
      keyColumns = Seq("k"), attrColumns = Seq("bal", "seg"),
      snapshotId = Some(2L), quiet = true))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("bal"),
        r.getAs[String]("seg"),
        Option(r.getAs[java.lang.Long]("valid_from")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue)))
        .toSet
    val want = canon(operators.Relational.scd2Merge(
      hist.toDF("k", "bal", "seg", "valid_from", "valid_to"),
      snap.toDF("k", "bal", "seg"), Seq("k"), Seq("bal", "seg"),
      snapshotId = 2L))
    val got = canon(spark.read.parquet(out))
    assert(n == want.size.toLong && got == want)
    // spot semantics: key 1 closed at 2 + reopened, key 3 closed at 2,
    // key 4 inserted open
    assert(got.contains((1L, 120L, "gold", Some(1L), Some(2L))))
    assert(got.contains((1L, 130L, "gold", Some(2L), None)))
    assert(got.contains((3L, 70L, "basic", Some(1L), Some(2L))))
    assert(got.contains((4L, 10L, "new", Some(2L), None)))
  }
}
