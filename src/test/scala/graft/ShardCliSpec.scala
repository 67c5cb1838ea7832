package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The `graft shard` CLI subcommand: parse contract + end-to-end runs
  * pinning CLI ≡ the library operators it fronts
  * ([[graft.operators.Pipeline.balancedShards]] and
  * [[graft.operators.Pipeline.curriculumOrder]]). */
class ShardCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseShardArgs: surface, defaults, mode/flag cross-checks") {
    import Main.parseShardArgs
    val a = parseShardArgs(Seq("-i", "/in", "-o", "/out",
      "--mode", "balance", "--token-column", "toks",
      "--shards", "16", "--quiet"))
    assert(a.mode == "balance" && a.tokenColumn.contains("toks") &&
      a.shards == 16 && a.quiet)
    val d = parseShardArgs(Seq("-i", "/in", "-o", "/out"))
    assert(d.mode == "balance" && d.shards == 64 &&
      d.tokenColumn.isEmpty && d.textColumn == "text")
    val cur = parseShardArgs(Seq("-i", "/in", "-o", "/out",
      "--mode", "curriculum", "--bucket-column", "band"))
    assert(cur.mode == "curriculum" && cur.bucketColumn.contains("band"))

    intercept[IllegalArgumentException](parseShardArgs(Seq("-i", "/in")))
    intercept[IllegalArgumentException](parseShardArgs(
      Seq("-i", "a", "-o", "b", "--mode", "zigzag")))
    // curriculum requires its bucket; cross-mode flags fail fast
    intercept[IllegalArgumentException](parseShardArgs(
      Seq("-i", "a", "-o", "b", "--mode", "curriculum")))
    intercept[IllegalArgumentException](parseShardArgs(
      Seq("-i", "a", "-o", "b", "--mode", "curriculum",
        "--bucket-column", "band", "--shards", "8")))
    intercept[IllegalArgumentException](parseShardArgs(
      Seq("-i", "a", "-o", "b", "--bucket-column", "band")))
    // --text-column where no token derivation happens fails fast
    // instead of silently doing nothing (review r18.2)
    intercept[IllegalArgumentException](parseShardArgs(
      Seq("-i", "a", "-o", "b", "--mode", "curriculum",
        "--bucket-column", "band", "--text-column", "body")))
    intercept[IllegalArgumentException](parseShardArgs(
      Seq("-i", "a", "-o", "b", "--token-column", "toks",
        "--text-column", "body")))
    intercept[Main.CliExit](parseShardArgs(Seq("--help")))
  }

  test("shard balance end-to-end: CLI ≡ balancedShards; derived n_tok; " +
      "clash + type guards") {
    val in = TestSpark.sfDir + "/documents.parquet"
    val out = tmp("shard-out") + "/sharded.parquet"
    Main.runShard(spark, Main.ShardArgs(
      input = in, outputFile = out, shards = 8, quiet = true))
    val got = spark.read.parquet(out)
      .select("doc_id", "n_tok", "rank", "shard").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap

    val docs = spark.read.parquet(in)
    val want = operators.Pipeline.balancedShards(
      docs.withColumn("n_tok",
        coalesce(size(array_remove(split(col("text"), "\\s+"), ""))
          .cast(LongType), lit(0L))),
      "doc_id", "n_tok", nShards = 8)
      .select("doc_id", "n_tok", "rank", "shard").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(got == want && got.nonEmpty)
    assert(got.values.map(_._3).toSet == (0 until 8).toSet)

    // --token-column path: skips derivation, uses the given counts
    val withToks = tmp("shard-toks")
    docs.select(col("doc_id"), (col("doc_id") % 100).cast(LongType)
      .as("toks")).write.mode("overwrite").parquet(withToks)
    val out2 = tmp("shard-out2") + "/sharded.parquet"
    Main.runShard(spark, Main.ShardArgs(input = withToks,
      outputFile = out2, tokenColumn = Some("toks"), shards = 4,
      quiet = true))
    val cols2 = spark.read.parquet(out2).columns.toSeq
    assert(cols2 == Seq("doc_id", "toks", "rank", "shard"),
      s"unexpected columns: $cols2")

    // a pre-existing derived column fails fast instead of overwriting
    val clashed = tmp("shard-clash")
    docs.select(col("doc_id"), col("text"), lit(0).as("rank"))
      .write.mode("overwrite").parquet(clashed)
    assert(intercept[IllegalArgumentException](
      Main.runShard(spark, Main.ShardArgs(input = clashed,
        outputFile = tmp("x") + "/o.parquet", quiet = true)))
      .getMessage.contains("rank"))
    // a string token column is rejected, not silently cast to NULL
    val strToks = tmp("shard-str")
    docs.select(col("doc_id"), col("text").as("toks"))
      .write.mode("overwrite").parquet(strToks)
    assert(intercept[IllegalArgumentException](
      Main.runShard(spark, Main.ShardArgs(input = strToks,
        outputFile = tmp("x2") + "/o.parquet",
        tokenColumn = Some("toks"), quiet = true)))
      .getMessage.contains("integral"))
  }

  test("shard curriculum end-to-end: CLI ≡ curriculumOrder") {
    val in = tmp("shard-cur")
    spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .select(col("doc_id"), col("text"),
        (col("n_chars") / 200).cast("int").as("band"))
      .write.mode("overwrite").parquet(in)
    val out = tmp("shard-cur-out") + "/ordered.parquet"
    Main.runShard(spark, Main.ShardArgs(input = in, outputFile = out,
      mode = "curriculum", bucketColumn = Some("band"), quiet = true))
    val got = spark.read.parquet(out)
      .select("doc_id", "band", "rk", "pos").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    val want = operators.Pipeline.curriculumOrder(
      spark.read.parquet(in), "doc_id", "band")
      .select("doc_id", "band", "rk", "pos").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want && got.nonEmpty)
    // pos is a permutation visiting bands in ascending order
    assert(got.values.map(_._3).toList.sorted == (1L to got.size).toList)
    val byBand = got.values.groupBy(_._1).view
      .mapValues(_.map(_._3)).toMap
    val bands = byBand.keys.toSeq.sorted
    bands.sliding(2).foreach {
      case Seq(lo, hi) => assert(byBand(lo).max < byBand(hi).min,
        s"band $lo positions overlap band $hi")
      case _ =>
    }
  }
}
