package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft scrub` CLI subcommand: parse contract + end-to-end runs
  * pinning CLI ≡ the library operators it fronts per mode
  * ([[graft.operators.Pipeline.admitAgainstCorpus]] /
  * `minhashNeardupAgainstCorpus` / `neardupFlagAgainstBloom` — never a
  * reimplementation), the DedupCliSpec shape. */
class ScrubCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseScrubArgs: full surface, defaults, mode-knob coupling, errors") {
    import Main.parseScrubArgs
    val a = parseScrubArgs(Seq("-i", "/in", "-r", "/ref", "-o", "/out",
      "--id-column", "id", "--text-column", "body", "--mode", "near",
      "--jaccard-min", "0.8", "--bands", "16", "--rows", "2",
      "--report-file", "/rep", "--compression", "snappy",
      "--multi-file", "--partition-by", "lang", "--quiet"))
    assert(a.input == "/in" && a.reference == "/ref" && a.outputFile == "/out")
    assert(a.idColumn == "id" && a.textColumn == "body")
    assert(a.mode == "near" && a.jaccardMin == 0.8)
    assert(a.bands == 16 && a.rows == 2 && a.reportFile.contains("/rep"))
    assert(a.compression == "snappy" && a.multiFile && a.quiet)
    assert(a.partitionBy == Seq("lang"))
    val b = parseScrubArgs(Seq("-i", "/in", "-r", "/ref", "-o", "/out",
      "--mode", "bloom", "--mbits", "65536", "--k", "3"))
    assert(b.mode == "bloom" && b.mBits == 65536 && b.k == 3)
    // CLI defaults equal the library defaults
    val d = parseScrubArgs(Seq("-i", "/in", "-r", "/ref", "-o", "/out"))
    assert(d.mode == "admit" && d.jaccardMin == 0.5 &&
      d.bands == 8 && d.rows == 4 && d.mBits == (1 << 22) && d.k == 5)

    intercept[IllegalArgumentException](parseScrubArgs(Seq("-i", "/in")))
    intercept[IllegalArgumentException](parseScrubArgs(Seq("--nope")))
    intercept[IllegalArgumentException](parseScrubArgs(
      Seq("-i", "a", "-r", "r", "-o", "b", "--mode", "fuzzy")))
    // mode-specific knobs must not silently no-op outside their mode
    val e1 = intercept[IllegalArgumentException](parseScrubArgs(
      Seq("-i", "a", "-r", "r", "-o", "b", "--jaccard-min", "0.8")))
    assert(e1.getMessage.contains("--jaccard-min") &&
      e1.getMessage.contains("near"))
    val e2 = intercept[IllegalArgumentException](parseScrubArgs(
      Seq("-i", "a", "-r", "r", "-o", "b", "--mode", "near",
        "--mbits", "1024")))
    assert(e2.getMessage.contains("--mbits") &&
      e2.getMessage.contains("bloom"))
    intercept[Main.CliExit](parseScrubArgs(Seq("--help")))
  }

  // new = even doc_ids, ref = odd — the p128 fixture split, so every
  // mode has real cross-side matches to act on
  private def writeSplit(): (String, String) = {
    val all = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
    val newDir = tmp("scrub-new") + "/new.parquet"
    val refDir = tmp("scrub-ref") + "/ref.parquet"
    all.filter(col("doc_id") % 2 === 0).write.parquet(newDir)
    all.filter(col("doc_id") % 2 === 1).write.parquet(refDir)
    (newDir, refDir)
  }

  test("scrub --mode admit ≡ admitAgainstCorpus (derived columns dropped)") {
    val (newDir, refDir) = writeSplit()
    val out = tmp("scrub-out") + "/kept.parquet"
    val stats = Main.runScrub(spark, Main.ScrubArgs(
      input = newDir, reference = refDir, outputFile = out, quiet = true))
    val want = operators.Pipeline.admitAgainstCorpus(
      spark.read.parquet(refDir), spark.read.parquet(newDir),
      "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = spark.read.parquet(out)
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == want)
    assert(stats.rows == want.size.toLong)
    // output carries ONLY caller columns — it can feed a later scrub
    assert(got.columns.toSet ==
      spark.read.parquet(newDir).columns.toSet)
  }

  test("scrub --mode near ≡ anti-join of minhashNeardupAgainstCorpus; report ≡ pairs") {
    val (newDir, refDir) = writeSplit()
    val out = tmp("scrub-out") + "/kept.parquet"
    val rep = tmp("scrub-rep") + "/pairs.parquet"
    val stats = Main.runScrub(spark, Main.ScrubArgs(
      input = newDir, reference = refDir, outputFile = out,
      mode = "near", reportFile = Some(rep), quiet = true))
    val pairs = operators.Pipeline.minhashNeardupAgainstCorpus(
      spark.read.parquet(newDir), spark.read.parquet(refDir),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.nonEmpty, "fixture lost its cross-parity near-dups")
    val flagged = pairs.map(_._1)
    val allNew = spark.read.parquet(newDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val got = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == allNew -- flagged && stats.rows == got.size.toLong)
    val gotRep = spark.read.parquet(rep)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotRep == pairs)
  }

  test("scrub --mode bloom ≡ neardupFlagAgainstBloom filter") {
    val (newDir, refDir) = writeSplit()
    val out = tmp("scrub-out") + "/kept.parquet"
    val stats = Main.runScrub(spark, Main.ScrubArgs(
      input = newDir, reference = refDir, outputFile = out,
      mode = "bloom", mBits = 1 << 16, k = 4, quiet = true))
    val P = operators.Pipeline
    val want = P.neardupFlagAgainstBloom(spark.read.parquet(newDir), "text",
      P.neardupBloomBuild(spark.read.parquet(refDir), "text", 1 << 16, 4),
      1 << 16, 4)
      .filter(!col("neardup_in_ref"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == want && stats.rows == want.size.toLong)
    // the bloom gate is a superset-flagger of the verified near mode:
    // every verified near-dup doc is also gate-flagged here (same
    // band family; bloom only ADDS false positives)
    val verified = P.minhashNeardupAgainstCorpus(
      spark.read.parquet(newDir), spark.read.parquet(refDir),
      "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(verified.intersect(got).isEmpty,
      "a verified near-dup survived the bloom gate")
  }

  test("scrub --mode semantic ≡ anti-join of embeddingNeardupAgainstCorpus; " +
      "knob coupling; derived dim") {
    import Main.parseScrubArgs
    val sa = parseScrubArgs(Seq("-i", "/in", "-r", "/ref", "-o", "/out",
      "--mode", "semantic", "--vector-column", "vec", "--tau", "0.5",
      "--report-file", "/rep"))
    assert(sa.mode == "semantic" && sa.vectorColumn == "vec" &&
      sa.tau == 0.5 && sa.reportFile.contains("/rep"))
    val e1 = intercept[IllegalArgumentException](parseScrubArgs(
      Seq("-i", "a", "-r", "r", "-o", "b", "--tau", "0.5")))
    assert(e1.getMessage.contains("--tau") &&
      e1.getMessage.contains("semantic"))
    // --report-file outside near/semantic must not silently no-op
    val e2 = intercept[IllegalArgumentException](parseScrubArgs(
      Seq("-i", "a", "-r", "r", "-o", "b", "--report-file", "/rep")))
    assert(e2.getMessage.contains("--report-file"))
    // semantic never reads text — --text-column there fails fast
    val e3 = intercept[IllegalArgumentException](parseScrubArgs(
      Seq("-i", "a", "-r", "r", "-o", "b", "--mode", "semantic",
        "--text-column", "body")))
    assert(e3.getMessage.contains("--text-column"))

    // end-to-end over the embeddings fixture, new = odd / ref = even
    val all = spark.read.parquet(TestSpark.sfDir + "/embeddings.parquet")
    val newDir = tmp("sem-new") + "/new.parquet"
    val refDir = tmp("sem-ref") + "/ref.parquet"
    all.filter(col("vec_id") % 2 === 1).write.parquet(newDir)
    all.filter(col("vec_id") % 2 === 0).write.parquet(refDir)
    val out = tmp("sem-out") + "/kept.parquet"
    val rep = tmp("sem-rep") + "/pairs.parquet"
    val stats = Main.runScrub(spark, Main.ScrubArgs(
      input = newDir, reference = refDir, outputFile = out,
      mode = "semantic", idColumn = "vec_id", tau = 0.4,
      reportFile = Some(rep), quiet = true))
    val pairs = operators.Pipeline.embeddingNeardupAgainstCorpus(
      spark.read.parquet(newDir), spark.read.parquet(refDir),
      "vec_id", "embedding", tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.nonEmpty, "fixture lost its cross-parity semantic pairs")
    val flagged = pairs.map(_._1)
    val allNew = spark.read.parquet(newDir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val kept = spark.read.parquet(out).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == allNew -- flagged && stats.rows == kept.size.toLong)
    val gotRep = spark.read.parquet(rep)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotRep == pairs)
    // the report carries the DOCUMENTED (doc_id, ref_id, cos_sim)
    // shape, like the near mode (review r18.2)
    assert(spark.read.parquet(rep).columns.toSeq ==
      Seq("doc_id", "ref_id", "cos_sim"))
  }

  test("scrub: bad input directory fails with a one-line error") {
    val e = intercept[IllegalArgumentException] {
      Main.runScrub(spark, Main.ScrubArgs(
        input = "/nonexistent-dir", reference = "/also-nonexistent",
        outputFile = "/tmp/x.parquet", quiet = true))
    }
    assert(e.getMessage.contains("--input"))
  }
}
