package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft ingest` CLI subcommand: parse contract + bounded
  * end-to-end runs pinning rows ≡ the library streaming chain it
  * fronts ([[graft.streaming.Streams.scrubAndGate]] → blocklistGate →
  * neardupGateOph → toParquet — never a reimplementation) and the
  * exactly-once rerun semantics of the checkpointed sink. */
class IngestCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // >= 5 words (real OPH band key) and > 50 chars (survives the
  // default min-chars gate)
  private val keepA = (1 to 12).map(i => s"alpha$i").mkString(" ")
  private val keepB = (1 to 12).map(i => s"beta$i").mkString(" ")
  private val blocked = "forbidden " + (1 to 11).map(i => s"gamma$i").mkString(" ")

  private def writeBacklog(dir: String): Unit = {
    import spark.implicits._
    Seq(
      (1L, keepA, "s1"),
      (2L, keepA, "s1"),   // exact dup of 1 → near-dup gate drops it
      (3L, keepB, "s2"),
      (4L, "short", "s2"), // under min-chars → scrub gate drops it
      (5L, blocked, "s2")  // blocklist drops it (when --badword given)
    ).toDF("doc_id", "text", "source")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("parseIngestArgs: full surface, defaults, integer-only " +
      "max-bytes-per-trigger, errors") {
    import Main.parseIngestArgs
    val a = parseIngestArgs(Seq("-i", "/in", "-o", "/out",
      "--checkpoint", "/ck", "--id-column", "id", "--text-column", "body",
      "--ts-column", "at", "--min-chars", "10", "--badword", "x",
      "--badword", "y", "--watermark", "2 hours",
      "--max-bytes-per-trigger", "1048576", "--quiet"))
    assert(a.input == "/in" && a.outputDir == "/out" && a.checkpoint == "/ck")
    assert(a.idColumn == "id" && a.textColumn == "body" && a.tsColumn == "at")
    assert(a.minChars == 10 && a.badwords == Seq("x", "y"))
    assert(a.watermark == "2 hours" &&
      a.maxBytesPerTrigger.contains(1048576L) && a.quiet)
    val d = parseIngestArgs(Seq("-i", "/in", "-o", "/out",
      "--checkpoint", "/ck"))
    assert(d.minChars == 50 && d.badwords.isEmpty &&
      d.watermark == "1 hour" && d.maxBytesPerTrigger.isEmpty &&
      d.tsColumn.isEmpty)

    intercept[IllegalArgumentException](parseIngestArgs(Seq("-i", "/in")))
    intercept[IllegalArgumentException](parseIngestArgs(Seq("--nope")))
    // the size-suffix foot-gun is rejected, not parsed
    val e = intercept[IllegalArgumentException](parseIngestArgs(
      Seq("-i", "a", "-o", "b", "--checkpoint", "c",
        "--max-bytes-per-trigger", "10m")))
    assert(e.getMessage.contains("integer"))
    intercept[IllegalArgumentException](parseIngestArgs(
      Seq("-i", "a", "-o", "b", "--checkpoint", "c",
        "--max-bytes-per-trigger", "0")))
    intercept[IllegalArgumentException](parseIngestArgs(
      Seq("-i", "a", "-o", "b", "--checkpoint", "c", "--min-chars", "-1")))
    intercept[Main.CliExit](parseIngestArgs(Seq("--help")))
  }

  test("ingest end-to-end: gates fire, rows ≡ the library chain, rerun " +
      "with the same checkpoint is exactly-once, new files append") {
    val in = tmp("ingest-in")
    writeBacklog(in)

    // the library chain spelled by hand over the same backlog
    val libOut = tmp("ingest-lib-out"); val libCk = tmp("ingest-lib-ck")
    val S = streaming.Streams
    val libDocs = spark.readStream
      .schema(spark.read.parquet(in).schema).parquet(in)
      .withColumn("ts", current_timestamp())
    val lq = S.toParquet(
      S.neardupGateOph(
        S.blocklistGate(S.scrubAndGate(libDocs), Seq("forbidden"))),
      libOut, libCk)
    try lq.processAllAvailable() finally lq.stop()
    val libTexts = spark.read.parquet(libOut)
      .select("text").collect().map(_.getString(0)).toSet

    val out = tmp("ingest-out"); val ck = tmp("ingest-ck")
    val args = Main.IngestArgs(input = in, outputDir = out,
      checkpoint = ck, badwords = Seq("forbidden"), quiet = true)
    val n1 = Main.runIngest(spark, args)
    val got = spark.read.parquet(out)
      .select("text", "n_pii").collect()
    assert(n1 == 2L && got.length == 2)
    // gates: dup collapsed, short dropped, blocklisted dropped
    assert(got.map(_.getString(0)).toSet == Set(keepA, keepB))
    assert(got.map(_.getString(0)).toSet == libTexts)
    // the scrub stage ran (n_pii column present, zero matches here)
    assert(got.forall(_.getLong(1) == 0L))

    // exactly-once: rerunning over the SAME committed backlog ingests
    // nothing new
    assert(Main.runIngest(spark, args) == 2L)

    // a new file arriving later is picked up by the next bounded run —
    // and only it (the near-dup state is gone between runs, but its
    // text is novel anyway)
    import spark.implicits._
    val keepC = (1 to 12).map(i => s"delta$i").mkString(" ")
    Seq((6L, keepC, "s3")).toDF("doc_id", "text", "source")
      .coalesce(1).write.mode("append").parquet(in)
    assert(Main.runIngest(spark, args) == 3L)
    assert(spark.read.parquet(out).select("text")
      .collect().map(_.getString(0)).toSet == Set(keepA, keepB, keepC))
  }

  test("ingest --mode cdc: parse surface; change feed ≡ the library " +
      "cdcGate and net state ≡ batch cdcApply; exactly-once rerun") {
    import Main.parseIngestArgs
    import spark.implicits._
    // parse: cdc flags land; cross-mode flags are loud
    val a0 = parseIngestArgs(Seq("-i", "/in", "-o", "/out",
      "--checkpoint", "/ck", "--mode", "cdc", "--key-column", "k",
      "--seq-column", "seq", "--op-column", "op", "--delete-op", "D"))
    assert(a0.mode == "cdc" && a0.keyColumns == Seq("k") &&
      a0.seqColumn == "seq" && a0.opColumn == "op" && a0.deleteOp == "D")
    assert(intercept[IllegalArgumentException](parseIngestArgs(
      Seq("-i", "a", "-o", "b", "--checkpoint", "c", "--mode", "cdc",
        "--key-column", "k", "--seq-column", "s", "--op-column", "o",
        "--min-chars", "10"))).getMessage.contains("no effect"))
    assert(intercept[IllegalArgumentException](parseIngestArgs(
      Seq("-i", "a", "-o", "b", "--checkpoint", "c",
        "--key-column", "k"))).getMessage.contains("no effect"))
    assert(intercept[IllegalArgumentException](parseIngestArgs(
      Seq("-i", "a", "-o", "b", "--checkpoint", "c", "--mode", "cdc")))
      .getMessage.contains("requires"))
    assert(intercept[IllegalArgumentException](parseIngestArgs(
      Seq("-i", "a", "-o", "b", "--checkpoint", "c", "--mode", "x")))
      .getMessage.contains("--mode"))

    // end-to-end over a changelog backlog
    val in = tmp("cdc-in")
    val log1 = Seq(
      (1L, 1L, "insert", "a1"), (1L, 2L, "update", "a2"),
      (2L, 1L, "insert", "b1"),
      (3L, 1L, "insert", "c1"), (3L, 2L, "delete", "c1"))
    log1.toDF("k", "seq", "op", "val").coalesce(1)
      .write.mode("append").parquet(in)
    val out = tmp("cdc-out"); val ck = tmp("cdc-ck")
    val args = Main.IngestArgs(input = in, outputDir = out,
      checkpoint = ck, mode = "cdc", keyColumns = Seq("k"),
      seqColumn = "seq", opColumn = "op", deleteOp = "delete",
      quiet = true)
    val n1 = Main.runIngest(spark, args)
    assert(n1 == 3L, s"expected 3 net changes, got $n1")
    // exactly-once: rerunning over the same committed backlog is silent
    assert(Main.runIngest(spark, args) == 3L)
    // a later changelog file folds on the carried state: the stale row
    // emits nothing, the resurrection and the new key emit
    val log2 = Seq(
      (2L, 1L, "insert", "XX"),   // stale → silent
      (3L, 3L, "insert", "c2"),   // resurrection
      (4L, 7L, "update", "d1"))
    log2.toDF("k", "seq", "op", "val").coalesce(1)
      .write.mode("append").parquet(in)
    assert(Main.runIngest(spark, args) == 5L)
    // net state (latest change per key, tombstones dropped) ≡ the
    // batch cdcApply over the full log
    val feed = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(3), r.getBoolean(4)))
    val net = feed.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
      .filterNot(_._4).map(t => (t._1, t._2, t._3)).toSet
    val batch = operators.Relational.cdcApply(
      (log1 ++ log2).toDF("k", "seq", "op", "val"),
      Seq("k"), Seq("seq"), "op", "delete")
      .collect().map(r => (s"v${r.getLong(0)}", r.getLong(1),
        s"""{"k":${r.getLong(0)},"val":"${r.getString(3)}"}""")).toSet
    assert(net == batch, s"CLI change feed $net diverged from $batch")
    // the payload JSON is the consumer contract: natural keys recover
    // via from_json without touching the internal key encoding
    val rec = spark.read.parquet(out)
      .select(from_json(col("payload"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, val STRING")).as("r"))
      .select("r.k").collect().map(_.getLong(0)).toSet
    assert(rec == Set(1L, 2L, 3L, 4L), s"natural keys not recoverable: $rec")
  }

  test("ingest: column validation is loud — clobbering renames and an " +
      "unnamed ts column are rejected") {
    import spark.implicits._
    val in = tmp("ingest-bad")
    Seq((1L, keepA, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("doc_id", "body", "ts")
      .write.mode("overwrite").parquet(in)
    // input already has 'ts' but --ts-column doesn't name it
    val e1 = intercept[IllegalArgumentException](Main.runIngest(spark,
      Main.IngestArgs(input = in, outputDir = tmp("o1"),
        checkpoint = tmp("c1"), textColumn = "body", quiet = true)))
    assert(e1.getMessage.contains("--ts-column"))
    // naming it works, and event time flows through
    val out = tmp("ingest-ts-out")
    val n = Main.runIngest(spark, Main.IngestArgs(input = in,
      outputDir = out, checkpoint = tmp("c2"), textColumn = "body",
      tsColumn = "ts", quiet = true))
    assert(n == 1L)
    assert(spark.read.parquet(out).select("ts").collect()
      .head.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
    // a text rename that would clobber an existing 'text' column
    val in2 = tmp("ingest-bad2")
    Seq((1L, keepA, "x")).toDF("doc_id", "body", "text")
      .write.mode("overwrite").parquet(in2)
    val e2 = intercept[IllegalArgumentException](Main.runIngest(spark,
      Main.IngestArgs(input = in2, outputDir = tmp("o3"),
        checkpoint = tmp("c3"), textColumn = "body", quiet = true)))
    assert(e2.getMessage.contains("'text'"))
    // a missing --input column fails with the readDocs one-liner
    val e3 = intercept[IllegalArgumentException](Main.runIngest(spark,
      Main.IngestArgs(input = in, outputDir = tmp("o4"),
        checkpoint = tmp("c4"), quiet = true)))
    assert(e3.getMessage.contains("--text-column"))
  }
}
