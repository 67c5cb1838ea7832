package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft curate` CLI subcommand: parse contract + end-to-end run
  * over the fixture corpus, asserting CLI output ≡ the library chain
  * it fronts (Curation.cleanText — never a reimplementation). */
class CurateCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseCurateArgs: full surface, repeatables, errors") {
    import Main.parseCurateArgs
    val a = parseCurateArgs(Seq("-i", "/in", "-o", "/out",
      "--id-column", "id", "--text-column", "body",
      "--url-column", "url", "--badword", "xx", "--badword", "yy",
      "--eval-file", "/eval", "--eval-text-column", "etext",
      "--decontaminate-n", "8", "--substring-min-len", "30",
      "--compression", "snappy", "--multi-file",
      "--partition-by", "lang", "--quiet"))
    assert(a.input == "/in" && a.outputFile == "/out")
    assert(a.idColumn == "id" && a.textColumn == "body" && a.urlColumn == "url")
    assert(a.badwords == Seq("xx", "yy"))
    assert(a.evalFile.contains("/eval") && a.evalTextColumn == "etext")
    assert(a.decontaminateN == 8 && a.substringMinLen == 30)
    assert(a.compression == "snappy" && a.multiFile && a.quiet)
    assert(a.partitionBy == Seq("lang"))

    // literal "--" marker lets a value that looks like a flag through
    val b = parseCurateArgs(Seq("-i", "/in", "-o", "/out",
      "--badword", "--", "--foo", "--text-column", "--", "--weird"))
    assert(b.badwords == Seq("--foo") && b.textColumn == "--weird")
    // without the marker, a flag-shaped value still fails loudly
    intercept[IllegalArgumentException](
      parseCurateArgs(Seq("-i", "/in", "-o", "/out", "--badword", "--foo")))

    intercept[IllegalArgumentException](parseCurateArgs(Seq("-i", "/in")))
    intercept[IllegalArgumentException](parseCurateArgs(Seq("--nope")))
    intercept[IllegalArgumentException](
      parseCurateArgs(Seq("-i", "a", "-o", "b", "--decontaminate-n", "0")))
    intercept[Main.CliExit](parseCurateArgs(Seq("--help")))
  }

  // pages must clear the C4 gate (3+ sentences, 5+-word lines ending
  // in terminal punctuation) — same fixture discipline as TextApiSpec's
  // cleanText cases; the synthetic documents table has no punctuation,
  // so crafted corpora carry the end-to-end assertions
  private val l1 = "alpha beta gamma delta epsilon zeta eta."
  private val l2 = "one two three four five six seven eight."
  private val l3 = "red orange yellow green blue indigo violet."

  test("curate end-to-end: runCurate output ≡ Curation.cleanText") {
    import spark.implicits._
    val in = tmp("curate-in") + "/docs.parquet"
    val page = Seq(l1, l2, l3).mkString("\n")
    Seq(
      (1L, page),
      (2L, Seq(l2, l3, l1).mkString("\n")),
      (3L, "too short."),
      (4L, page + "\nthis fresh closing line arrives here too."))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val out = tmp("curate") + "/clean.parquet"
    val stats = Main.runCurate(spark, Main.CurateArgs(
      input = in, outputFile = out, quiet = true))
    assert(stats.rows > 0)
    val written = spark.read.parquet(out)
    assert(written.columns.toSet == Set("doc_id", "n_lines", "n_kept_lines",
      "n_words", "n_cut_words", "n_flagged_grams", "text_clean"))
    val lib = operators.Curation.cleanText(
      spark.read.parquet(in), "doc_id", "text")
    val a = written.orderBy("doc_id").collect().map(_.toSeq)
    val b = lib.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.nonEmpty && a.length == b.length &&
      a.zip(b).forall { case (x, y) => x == y })
  }

  test("curate: badwords + eval decontamination flow through the chain") {
    import spark.implicits._
    val in = tmp("curate-in") + "/docs.parquet"
    val evalDir = tmp("curate-eval") + "/eval.parquet"
    val badPage = Seq("this slow page crawls badterm badly ok.", l2, l3)
      .mkString("\n")
    Seq(
      (1L, Seq(l1, l2, l3).mkString("\n")),
      (2L, badPage),
      (3L, Seq(l3, l1, l2).mkString("\n")))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    Seq(Tuple1(l1)).toDF("text")
      .write.mode("overwrite").parquet(evalDir)
    val out = tmp("curate-out") + "/clean.parquet"
    Main.runCurate(spark, Main.CurateArgs(
      input = in, outputFile = out, badwords = Seq("badterm"),
      evalFile = Some(evalDir), decontaminateN = 3, quiet = true))
    val rows = spark.read.parquet(out).orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L), "badword page must drop")
    // global paragraph dedup keeps l1 in only ONE surviving doc, so
    // exactly that doc can flag the contaminated 3-grams
    assert(rows.exists(r => r.getLong(r.fieldIndex("n_flagged_grams")) > 0),
      "eval 3-grams from l1 must flag in the doc that retains it")
  }

  test("curate --nfc: decomposed duplicates collapse that otherwise survive") {
    import spark.implicits._
    val in = tmp("curate-nfc") + "/docs.parquet"
    val composedPage = Seq("caf\u00e9 " + l1, l2, l3).mkString("\n")
    val decomposedPage = Seq("cafe\u0301 " + l1, l2, l3).mkString("\n")
    Seq((1L, composedPage), (2L, decomposedPage))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    def runWith(nfc: Boolean): Array[String] = {
      val out = tmp("curate-nfc-out") + "/c.parquet"
      Main.runCurate(spark, Main.CurateArgs(input = in, outputFile = out,
        nfc = nfc, quiet = true))
      spark.read.parquet(out).orderBy("doc_id")
        .select("text_clean").collect().map(_.getString(0))
    }
    // without NFC the two spellings hash apart through every dedup
    // stage; with it the first line is one paragraph, deduped globally
    val plain = runWith(nfc = false)
    assert(plain.length == 2 && plain.toSet.size == 2)
    val norm = runWith(nfc = true)
    assert(norm.length == 2)
    val firstLines = norm.map(_.split("\n").head)
    assert(firstLines.count(_.nonEmpty) == 1,
      s"NFC should make the caf\u00e9 paragraph an exact duplicate: " +
        s"${firstLines.toSeq}")
    assert(Main.parseCurateArgs(Seq("-i", "a", "-o", "b", "--nfc")).nfc)
  }

  test("curate --select: gate/select chain ≡ Curation.curate") {
    val out = tmp("curate-sel") + "/sel.parquet"
    val stats = Main.runCurate(spark, Main.CurateArgs(
      input = TestSpark.sfDir + "/documents.parquet",
      outputFile = out, select = true, quiet = true))
    assert(stats.rows > 0)
    val cli = spark.read.parquet(out).orderBy("doc_id").collect().map(_.toSeq)
    val lib = operators.Curation.curate(
      spark.read.parquet(TestSpark.sfDir + "/documents.parquet"))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(cli.length == lib.length &&
      cli.zip(lib).forall { case (a, b) => a == b })
    // parse surface for the select flags
    val pa = Main.parseCurateArgs(Seq("-i", "/in", "-o", "/out", "--select",
      "--lang", "en", "--lang", "zh", "--min-chars", "50",
      "--min-quality", "0.25", "--max-tokens", "500"))
    assert(pa.select && pa.langs == Seq("en", "zh") && pa.minChars == 50L &&
      pa.minQuality == 0.25 && pa.maxTokens == 500L)
    // cleaning-only flags fail loudly under --select instead of no-oping
    val e0 = intercept[IllegalArgumentException](Main.runCurate(spark,
      Main.CurateArgs(input = TestSpark.sfDir + "/documents.parquet",
        outputFile = "/tmp/n.parquet", select = true,
        badwords = Seq("x"), quiet = true)))
    assert(e0.getMessage.contains("--badword"))
    // select mode demands the documents contract
    import spark.implicits._
    val thin = tmp("curate-thin") + "/docs.parquet"
    Seq((1L, "x")).toDF("doc_id", "text").write.parquet(thin)
    val e = intercept[IllegalArgumentException](Main.runCurate(spark,
      Main.CurateArgs(input = thin, outputFile = "/tmp/n.parquet",
        select = true, quiet = true)))
    assert(e.getMessage.contains("lang") || e.getMessage.contains("n_chars"))
  }

  test("datacard: parse + run over the fixture corpus, strata rows add up") {
    import Main.parseDatacardArgs
    val pa = parseDatacardArgs(Seq("-i", "/in", "--strata", "lang",
      "--strata", "source", "-o", "/card.parquet", "--quiet"))
    assert(pa.input == "/in" && pa.strata == Seq("lang", "source") &&
      pa.outputFile.contains("/card.parquet") && pa.quiet)
    intercept[IllegalArgumentException](parseDatacardArgs(Seq()))
    intercept[Main.CliExit](parseDatacardArgs(Seq("--help")))

    val out = tmp("datacard") + "/card.parquet"
    val rows = Main.runDatacard(spark, Main.DatacardArgs(
      input = TestSpark.sfDir + "/documents.parquet",
      strata = Seq("lang"), outputFile = Some(out), quiet = true))
    val total = rows.find(r => r.getString(0) == "corpus").get
    val langRows = rows.filter(_.getString(0) == "by_lang")
    assert(langRows.nonEmpty)
    assert(langRows.map(_.getLong(2)).sum == total.getLong(2),
      "per-lang doc counts must sum to the corpus total")
    assert(langRows.map(_.getLong(3)).sum == total.getLong(3))
    // the parquet mirror carries the same rows
    assert(spark.read.parquet(out).count() == rows.length)
    intercept[IllegalArgumentException](Main.runDatacard(spark,
      Main.DatacardArgs(input = TestSpark.sfDir + "/documents.parquet",
        strata = Seq("nope"), quiet = true)))
    // the NON-quiet print must survive the quality rows' NULL
    // token/char cells (review r16: getLong on a null cell NPE'd and
    // every test passed quiet=true)
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      Main.runDatacard(spark, Main.DatacardArgs(
        input = TestSpark.sfDir + "/documents.parquet",
        strata = Seq("lang"), quiet = false))
    }
    val printed = buf.toString
    assert(printed.contains("corpus") && printed.contains("null_text"),
      s"print must include totals and quality counters:\n$printed")
    assert(printed.linesIterator.exists(l =>
      l.contains("null_text") && l.contains("-")),
      "quality rows print '-' for their NULL token/char cells")
  }

  test("diff: CLI snapshot diff writes the table and the 4-bounded summary") {
    import spark.implicits._
    val prevDir = tmp("diff-prev") + "/p.parquet"
    val currDir = tmp("diff-curr") + "/c.parquet"
    Seq((1L, "same"), (2L, "old"), (3L, "gone"))
      .toDF("doc_id", "text").write.parquet(prevDir)
    Seq((1L, "same"), (2L, "new"), (4L, "fresh"))
      .toDF("doc_id", "text").write.parquet(currDir)
    val out = tmp("diff-out") + "/d.parquet"
    val counts = Main.runDiff(spark, Main.DiffArgs(
      prev = prevDir, curr = currDir, outputFile = out, quiet = true))
    assert(counts == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
    assert(spark.read.parquet(out).columns.toSeq ==
      Seq("doc_id", "prev_hash", "curr_hash", "status"))
    import Main.parseDiffArgs
    intercept[IllegalArgumentException](parseDiffArgs(Seq("--prev", "a")))
    intercept[Main.CliExit](parseDiffArgs(Seq("--help")))
  }

  test("curate: missing columns and unreadable input fail with one-line errors") {
    val e1 = intercept[IllegalArgumentException] {
      Main.runCurate(spark, Main.CurateArgs(
        input = TestSpark.sfDir + "/documents.parquet",
        outputFile = "/tmp/nope.parquet", textColumn = "no_such", quiet = true))
    }
    assert(e1.getMessage.contains("no_such"))
    val e2 = intercept[IllegalArgumentException] {
      Main.runCurate(spark, Main.CurateArgs(
        input = "/definitely/not/here",
        outputFile = "/tmp/nope.parquet", quiet = true))
    }
    assert(e2.getMessage.contains("--input"))
  }
}
