package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft index` / `graft ann` CLI subcommands: parse contract +
  * end-to-end runs pinning CLI ≡ the library ladder they front
  * ([[graft.operators.Pipeline.ivfIndex]] / pqResiduals / pqTrain /
  * pqEncode / ivfpqSearch / ivfSearch — never a reimplementation),
  * the DedupCliSpec shape. */
class AnnCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val P = operators.Pipeline

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def embIn: String = TestSpark.sfDir + "/embeddings.parquet"

  test("parseIndexArgs: full surface, defaults, PQ-knob guard, errors") {
    import Main.parseIndexArgs
    val a = parseIndexArgs(Seq("-i", "/in", "-o", "/idx", "--dim", "64",
      "--id-column", "id", "--vector-column", "v", "--clusters", "8",
      "--iters", "3", "--pq", "--m", "8", "--ksub", "32", "--residual",
      "--compression", "snappy", "--quiet"))
    assert(a.input == "/in" && a.outputDir == "/idx" && a.dim == 64)
    assert(a.idColumn == "id" && a.vectorColumn == "v")
    assert(a.clusters == 8 && a.iters == 3)
    assert(a.pq && a.m == 8 && a.ksub == 32 && a.residual)
    assert(a.compression == "snappy" && a.quiet)
    // CLI defaults must equal the library defaults the ladder uses
    val d = parseIndexArgs(Seq("-i", "/in", "-o", "/idx", "--dim", "64"))
    assert(d.clusters == 32 && d.iters == 2 && !d.pq && d.m == 4 &&
      d.ksub == 16 && !d.residual)

    intercept[IllegalArgumentException](parseIndexArgs(Seq("-i", "/in")))
    intercept[IllegalArgumentException](
      parseIndexArgs(Seq("-i", "a", "-o", "b"))) // --dim required
    intercept[IllegalArgumentException](parseIndexArgs(Seq("--nope")))
    // PQ knobs must not silently no-op without --pq
    val e = intercept[IllegalArgumentException](parseIndexArgs(
      Seq("-i", "a", "-o", "b", "--dim", "64", "--m", "8", "--residual")))
    assert(e.getMessage.contains("--m") && e.getMessage.contains("--residual"))
    // dim must divide into m subspaces
    intercept[IllegalArgumentException](parseIndexArgs(
      Seq("-i", "a", "-o", "b", "--dim", "10", "--pq", "--m", "4")))
    intercept[Main.CliExit](parseIndexArgs(Seq("--help")))
  }

  test("parseAnnArgs: full surface, defaults, errors") {
    import Main.parseAnnArgs
    val a = parseAnnArgs(Seq("--index-dir", "/idx", "-q", "/q", "-o", "/out",
      "-i", "/raw", "--id-column", "id", "--vector-column", "v",
      "--k", "3", "--nprobe", "4", "--keep-self", "--quiet"))
    assert(a.indexDir == "/idx" && a.queries == "/q" &&
      a.outputFile == "/out" && a.input == "/raw")
    assert(a.idColumn == "id" && a.vectorColumn == "v")
    assert(a.k == 3 && a.nprobe == 4 && a.keepSelf && a.quiet)
    val d = parseAnnArgs(Seq("--index-dir", "/idx", "-q", "/q", "-o", "/out"))
    assert(d.k == 10 && d.nprobe == 1 && !d.keepSelf &&
      d.idColumn.isEmpty && d.vectorColumn.isEmpty)

    intercept[IllegalArgumentException](parseAnnArgs(Seq("-q", "/q")))
    intercept[IllegalArgumentException](parseAnnArgs(Seq("--nope")))
    intercept[IllegalArgumentException](parseAnnArgs(
      Seq("--index-dir", "a", "-q", "b", "-o", "c", "--k", "0")))
    intercept[Main.CliExit](parseAnnArgs(Seq("--help")))
  }

  test("index + ann end-to-end (IVF): artifacts land, CLI ≡ library, " +
      "non-PQ query demands --input") {
    val idx = tmp("ann-idx")
    val out = tmp("ann-out") + "/hits.parquet"
    val stats = Main.runIndex(spark, Main.IndexArgs(
      input = embIn, outputDir = idx, dim = 64, clusters = 4,
      quiet = true))
    assert(stats.rows > 0)
    for (f <- Seq("members.parquet", "centroids.parquet", "meta.json"))
      assert(new java.io.File(s"$idx/$f").exists(), s"missing $f")
    // no PQ artifacts without --pq
    assert(!new java.io.File(s"$idx/codes.parquet").exists())

    // a non-PQ index cannot serve from artifacts alone
    val e = intercept[IllegalArgumentException](Main.runAnn(spark,
      Main.AnnArgs(indexDir = idx, queries = embIn, outputFile = out,
        quiet = true)))
    assert(e.getMessage.contains("--input"))

    Main.runAnn(spark, Main.AnnArgs(indexDir = idx, queries = embIn,
      input = embIn, outputFile = out, k = 3, nprobe = 2, quiet = true))
    val got = spark.read.parquet(out)
      .select("q_id", "vec_id", "score", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

    // the library chain the CLI fronts, spelled by hand
    val vecs = spark.read.parquet(embIn)
    val (member, cents) = P.ivfIndex(vecs, "vec_id", "embedding",
      k = 4, dim = 64, iters = 2)
    val clustered = vecs.join(member.select(col("vec_id"), col("cluster")),
      Seq("vec_id"))
    val want = P.ivfSearch(clustered, vecs, "vec_id", "embedding",
      "cluster", k = 3, nprobe = 2, centroids = Some(cents))
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == want && got.nonEmpty)
  }

  test("index + ann end-to-end (IVFADC residual PQ): serves from artifacts " +
      "alone, CLI ≡ library, --input rejected") {
    val idx = tmp("annpq-idx")
    val out = tmp("annpq-out") + "/hits.parquet"
    Main.runIndex(spark, Main.IndexArgs(
      input = embIn, outputDir = idx, dim = 64, clusters = 4,
      pq = true, m = 4, ksub = 8, residual = true, quiet = true))
    for (f <- Seq("members.parquet", "centroids.parquet",
        "codebooks.parquet", "codes.parquet", "meta.json"))
      assert(new java.io.File(s"$idx/$f").exists(), s"missing $f")

    // a PQ index must reject --input, not silently ignore it
    val e = intercept[IllegalArgumentException](Main.runAnn(spark,
      Main.AnnArgs(indexDir = idx, queries = embIn, input = embIn,
        outputFile = out, quiet = true)))
    assert(e.getMessage.contains("PQ"))

    Main.runAnn(spark, Main.AnnArgs(indexDir = idx, queries = embIn,
      outputFile = out, k = 3, nprobe = 2, quiet = true))
    val got = spark.read.parquet(out)
      .select("q_id", "vec_id", "score", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

    val vecs = spark.read.parquet(embIn)
    val (member0, cents0) = P.ivfIndex(vecs, "vec_id", "embedding",
      k = 4, dim = 64, iters = 2)
    val member = member0.localCheckpoint()
    val cents = cents0.localCheckpoint()
    try {
      val resid = P.pqResiduals(vecs, "vec_id", "embedding", member, cents)
        .localCheckpoint()
      try {
        val books = P.pqTrain(resid, "vec_id", "residual",
          dim = 64, m = 4, ksub = 8)
        val codes = P.pqEncode(resid, "vec_id", "residual", books,
          dim = 64, m = 4)
        val want = P.ivfpqSearch(member, codes, vecs, cents, books,
          "vec_id", "embedding", k = 3, dim = 64, m = 4, ksub = 8,
          nprobe = 2, residual = true)
          .select(col("q_id"), col("vec_id"), col("adist"), col("rk"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
          .toSet
        assert(got == want && got.nonEmpty)
      } finally P.releaseLocalCheckpoint(resid, blocking = true)
    } finally {
      P.releaseLocalCheckpoint(member, blocking = true)
      P.releaseLocalCheckpoint(cents, blocking = true)
    }
  }

  test("ann: a directory without meta.json fails with one clear line") {
    val e = intercept[IllegalArgumentException](Main.runAnn(spark,
      Main.AnnArgs(indexDir = tmp("not-an-index"), queries = embIn,
        outputFile = "/tmp/x.parquet", quiet = true)))
    assert(e.getMessage.contains("meta.json"))
  }
}
