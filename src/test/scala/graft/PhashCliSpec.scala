package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The `graft phash` CLI subcommand: parse contract + end-to-end runs
  * pinning CLI ≡ the library operators it fronts per mode
  * ([[Multimodal.imagePerceptualHash]] / `imageNeardupPairs` /
  * `imageNeardupAgainstCorpus` — never a reimplementation), the
  * DedupCliSpec/ScrubCliSpec shape. */
class PhashCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parsePhashArgs: full surface, defaults, mode-knob coupling, errors") {
    import Main.parsePhashArgs
    val a = parsePhashArgs(Seq("-i", "/in", "-o", "/out",
      "--id-column", "img", "--payload-column", "bytes", "--mode", "scrub",
      "-r", "/ref", "--tau", "2", "--bucket-cap", "50",
      "--report-file", "/rep", "--compression", "snappy",
      "--multi-file", "--partition-by", "day", "--quiet"))
    assert(a.input == "/in" && a.outputFile == "/out")
    assert(a.idColumn == "img" && a.payloadColumn == "bytes")
    assert(a.mode == "scrub" && a.reference == "/ref")
    assert(a.tau == 2 && a.bucketCap == 50 && a.reportFile.contains("/rep"))
    assert(a.compression == "snappy" && a.multiFile && a.quiet)
    assert(a.partitionBy == Seq("day"))
    // CLI defaults equal the library defaults
    val d = parsePhashArgs(Seq("-i", "/in", "-o", "/out"))
    assert(d.mode == "hash" && d.idColumn == "doc_id" &&
      d.payloadColumn == "payload" && d.tau == 3 && d.bucketCap == 1000)

    intercept[IllegalArgumentException](parsePhashArgs(Seq("-i", "/in")))
    intercept[IllegalArgumentException](parsePhashArgs(Seq("--nope")))
    intercept[IllegalArgumentException](parsePhashArgs(
      Seq("-i", "a", "-o", "b", "--mode", "dhash")))
    // tau outside the pigeonhole-exact range
    intercept[IllegalArgumentException](parsePhashArgs(
      Seq("-i", "a", "-o", "b", "--mode", "pairs", "--tau", "4")))
    // mode-specific knobs must not silently no-op outside their mode
    val e1 = intercept[IllegalArgumentException](parsePhashArgs(
      Seq("-i", "a", "-o", "b", "--tau", "2")))
    assert(e1.getMessage.contains("--tau"))
    val e2 = intercept[IllegalArgumentException](parsePhashArgs(
      Seq("-i", "a", "-o", "b", "--mode", "pairs", "-r", "/ref")))
    assert(e2.getMessage.contains("--reference"))
    val e3 = intercept[IllegalArgumentException](parsePhashArgs(
      Seq("-i", "a", "-o", "b", "--mode", "scrub")))
    assert(e3.getMessage.contains("--reference"))
    intercept[Main.CliExit](parsePhashArgs(Seq("--help")))
  }

  // 40 patterned PNGs (10 δ-families) with an ALIEN id column name —
  // real image bytes through the real CLI read path
  private def writeImages(dir: String, ids: Seq[Long]): String = {
    import spark.implicits._
    val path = dir + "/imgs.parquet"
    ids.map(id => (id, Multimodal.renderPatternPng(id)))
      .toDF("img_id", "png")
      .write.parquet(path)
    path
  }

  test("phash --mode hash ≡ imagePerceptualHash; alien columns; " +
    "non-binary payload rejected loudly") {
    val in = writeImages(tmp("phash-in"), 0L until 40L)
    val out = tmp("phash-out") + "/hashes.parquet"
    val stats = Main.runPhash(spark, Main.PhashArgs(
      input = in, outputFile = out, idColumn = "img_id",
      payloadColumn = "png", quiet = true))
    assert(stats.rows == 40L)
    val got = spark.read.parquet(out)
      .orderBy(col("img_id")).collect()
      .map(r => (r.getAs[Long]("img_id"), r.getAs[Int]("b0"),
        r.getAs[Int]("b1"), r.getAs[Int]("b2"), r.getAs[Int]("b3")))
    import spark.implicits._
    val want = Multimodal.imagePerceptualHash(
      (0L until 40L).map(id => Multimodal.MediaRecord(
        id, "image/png", Multimodal.renderPatternPng(id))).toDS())
      .collect().sortBy(_.doc_id)
      .map(p => (p.doc_id, p.b0, p.b1, p.b2, p.b3))
    assert(got.toSeq == want.toSeq)
    // a string payload column fails ONCE at read validation, not
    // row-by-row inside executors
    val badPath = tmp("phash-bad") + "/bad.parquet"
    Seq((1L, "not image bytes")).toDF("img_id", "png")
      .write.parquet(badPath)
    val e = intercept[IllegalArgumentException] {
      Main.runPhash(spark, Main.PhashArgs(input = badPath,
        outputFile = out, idColumn = "img_id", payloadColumn = "png",
        quiet = true))
    }
    assert(e.getMessage.contains("BINARY"))
  }

  test("phash --mode pairs ≡ imageNeardupPairs") {
    import spark.implicits._
    val in = writeImages(tmp("phash-in2"), 0L until 40L)
    val out = tmp("phash-out2") + "/pairs.parquet"
    Main.runPhash(spark, Main.PhashArgs(
      input = in, outputFile = out, idColumn = "img_id",
      payloadColumn = "png", mode = "pairs", quiet = true))
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val want = Multimodal.imageNeardupPairs(
      Multimodal.imagePerceptualHash(
        (0L until 40L).map(id => Multimodal.MediaRecord(
          id, "image/png", Multimodal.renderPatternPng(id))).toDS()),
      tau = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("phash: decode-once hashes and the report checkpoint all release " +
    "— zero leaked blocks after any mode (the pipelineEndToEnd stance)") {
    val in = writeImages(tmp("phash-leak"), 0L until 24L)
    val ref = writeImages(tmp("phash-leak-ref"), 24L until 40L)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Main.runPhash(spark, Main.PhashArgs(input = in,
      outputFile = tmp("phash-leak-o") + "/p.parquet", idColumn = "img_id",
      payloadColumn = "png", mode = "pairs", quiet = true))
    Main.runPhash(spark, Main.PhashArgs(input = in, reference = ref,
      outputFile = tmp("phash-leak-o2") + "/k.parquet", idColumn = "img_id",
      payloadColumn = "png", mode = "scrub",
      reportFile = Some(tmp("phash-leak-o2") + "/r.parquet"), quiet = true))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"phash leaked cached/checkpointed blocks: $leaked")
  }

  test("phash --mode scrub ≡ imageNeardupAgainstCorpus anti-join; " +
    "report pairs; output carries only caller columns") {
    import spark.implicits._
    val ids = 0L until 40L
    val in = writeImages(tmp("phash-new"), ids.filter(_ % 2 == 0))
    val ref = writeImages(tmp("phash-ref"), ids.filter(_ % 2 == 1))
    val out = tmp("phash-out3") + "/kept.parquet"
    val rep = tmp("phash-out3") + "/report.parquet"
    val stats = Main.runPhash(spark, Main.PhashArgs(
      input = in, reference = ref, outputFile = out, idColumn = "img_id",
      payloadColumn = "png", mode = "scrub", reportFile = Some(rep),
      quiet = true))
    def hs(sel: Long => Boolean) = Multimodal.imagePerceptualHash(
      ids.filter(sel).map(id => Multimodal.MediaRecord(
        id, "image/png", Multimodal.renderPatternPng(id))).toDS())
    val wantPairs = Multimodal.imageNeardupAgainstCorpus(
      hs(_ % 2 == 0), hs(_ % 2 == 1), tau = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val gotPairs = spark.read.parquet(rep)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotPairs == wantPairs && wantPairs.nonEmpty)
    val flagged = wantPairs.map(_._1)
    val survivors = spark.read.parquet(out)
    assert(survivors.collect().map(_.getAs[Long]("img_id")).toSet ==
      ids.filter(_ % 2 == 0).toSet -- flagged)
    assert(stats.rows == (ids.count(_ % 2 == 0) - flagged.size).toLong)
    // caller columns only — the survivors can feed a later phash run
    assert(survivors.columns.toSet == Set("img_id", "png"))
  }
}
