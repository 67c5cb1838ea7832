package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import graft.operators.Pipeline

/** The r19 two-level salted rank (r18 verdict #1): every stratified
  * sampler and layout rank used to run ONE window task per
  * stratum/size-class — parallelism bounded by a handful of buckets, a
  * real 100 TB ceiling. The rewrite ranks within (stratum, 8-bit
  * md5-prefix salt) / (size class, top-9-bit sub-class) and completes
  * with broadcast count offsets. This suite pins BOTH halves of the
  * contract:
  *   1. two-level ≡ one-level — the salted construction returns ranks
  *      (and running sums) bit-identical to the plain
  *      stratum-partitioned window, on the fixture and on randomized
  *      skewed inputs;
  *   2. the plan — every Window that consumes corpus rows (no
  *      Aggregate beneath it) partitions by ≥ 2 expressions, i.e. the
  *      salt/sub-class actually reaches the physical partitioning
  *      (only the parameter-scale offsets/waterfilling windows, which
  *      sit ABOVE an Aggregate, may partition coarser). */
class SamplingTwoLevelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs: DataFrame = spark.read
    .parquet(s"${TestSpark.sfDir}/documents.parquet")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  private def check(p: Prop, n: Int = 10): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  // the plain ONE-LEVEL spelling the two-level construction must equal:
  // row_number over (PARTITION BY stratum ORDER BY md5(stratum:id), id)
  private def oneLevel(df: DataFrame, stratum: String, id: String) =
    Window.partitionBy(col(stratum)).orderBy(
      md5(concat(col(stratum), lit(":"), col(id).cast("string"))), col(id))

  test("stratifiedSplit: two-level rank ≡ the one-level stratum window " +
      "on the fixture") {
    val d = docs.select(col("doc_id"), col("lang"))
    val got = Pipeline.stratifiedSplit(d, "doc_id", "lang")
      .select(col("doc_id"), col("rk"), col("split"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("__n"))
    val want = d.join(broadcast(counts), Seq("lang"))
      .withColumn("rk",
        row_number().over(oneLevel(d, "lang", "doc_id")).cast(LongType))
      .withColumn("split",
        when(col("rk") <= floor(lit(0.8) * col("__n")), "train")
          .when(col("rk") <= floor(lit(0.8) * col("__n"))
            + floor(lit(0.1) * col("__n")), "val")
          .otherwise("test"))
      .select(col("doc_id"), col("rk"), col("split"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want)
  }

  // one-level twin of unimaxSample: identical waterfilling quotas
  // (unchanged code path), rank + cum from the plain
  // stratum-partitioned window
  private def oneLevelUnimax(d: DataFrame, budget: Long)
      : Set[(Long, Long, Long)] = {
    val caps = d.groupBy(col("lang"))
      .agg(sum(col("n_tok")).as("__n"))
      .select(col("lang"), (col("__n") * 2).as("__c"))
    val byCap = Window.orderBy(col("__c"), col("lang"))
    val pre = byCap.rowsBetween(Window.unboundedPreceding, -1)
    val all = byCap.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = caps
      .withColumn("__i", row_number().over(byCap))
      .withColumn("__L", count(lit(1)).over(all))
      .withColumn("__pre", coalesce(sum(col("__c")).over(pre), lit(0L)))
      .withColumn("__capped",
        col("__c") * (col("__L") - col("__i") + 1) + col("__pre") <= budget)
      .withColumn("__sc",
        sum(when(col("__capped"), col("__c")).otherwise(0L)).over(all))
      .withColumn("__u",
        sum(when(col("__capped"), 0L).otherwise(1L)).over(all))
      .select(col("lang"),
        when(col("__capped"), col("__c"))
          .otherwise(expr(s"($budget - __sc) div __u")).as("quota"))
    val w = oneLevel(d, "lang", "doc_id")
    d.join(broadcast(quotas), Seq("lang"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .withColumn("__cum", sum(col("n_tok")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__cum") <= col("quota"))
      .collect().map(r => (r.getLong(1), r.getLong(4), r.getLong(3))).toSet
  }

  test("unimaxSample: two-level rank AND running admission sum ≡ the " +
      "one-level stratum window on the fixture") {
    val d = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), "\\s+")).cast(LongType).as("n_tok"))
    val got = Pipeline.unimaxSample(d, "doc_id", "lang", "n_tok",
      budget = 40000L, epochs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(got.nonEmpty && got == oneLevelUnimax(d, 40000L))
  }

  test("unimaxSample: NULL token rows — the running sum's NULL placement " +
      "matches the one-level window exactly (review r19.2)") {
    // 90% NULL tokens → many (stratum, salt) partitions are ALL-NULL;
    // the one-level cum for a row in such a salt is non-NULL whenever
    // any EARLIER salt held values — salt-local sums alone get this
    // wrong (the non-null-count completion is what the test pins)
    val d = docs.select(col("doc_id"), col("lang"),
      when(col("doc_id") % 10 === 0, lit(7L))
        .otherwise(lit(null).cast(LongType)).as("n_tok"))
    val got = Pipeline.unimaxSample(d, "doc_id", "lang", "n_tok",
      budget = 140L, epochs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    val want = oneLevelUnimax(d, 140L)
    assert(got.nonEmpty && got == want,
      s"two-level diverged under NULLs: only-got=${got -- want} " +
        s"only-want=${want -- got}")
  }

  test("stratified rank: randomized skew — few strata, heavy salt " +
      "spread, ≡ the local md5 sort model") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(50, 300)
      langs <- Gen.listOfN(n, Gen.oneOf("en", "de", "zh"))
    } yield langs.zipWithIndex.map { case (l, i) => (i.toLong, l) }
    check(Prop.forAll(gen) { rows =>
      val got = Pipeline
        .stratifiedSplit(rows.toDF("k", "lang"), "k", "lang")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val want = rows.groupBy(_._2).flatMap { case (l, rs) =>
        rs.map(_._1).sortBy(k => (md5hex(s"$l:$k"), k)).zipWithIndex
          .map { case (k, i) => (k, i + 1L) }
      }
      got == want
    }, n = 5)
  }

  test("plan pin: every corpus-consuming Window partitions by ≥ 2 " +
      "expressions (the salt/sub-class reaches the partitioning)") {
    val d = docs.select(col("doc_id"), col("lang"),
      col("n_chars").cast(LongType).as("n_tok"))
    val plans = Seq(
      "stratifiedSplit" -> Pipeline.stratifiedSplit(d, "doc_id", "lang"),
      "temperatureSample" -> Pipeline.temperatureSample(
        d, "doc_id", "lang", budget = 100L, alpha = 0.5),
      "rebalanceToMix" -> Pipeline.rebalanceToMix(d, "doc_id", "lang",
        weights = Seq("en" -> 40L, "de" -> 15L, "fr" -> 15L,
          "es" -> 15L, "zh" -> 15L)),
      "unimaxSample" -> Pipeline.unimaxSample(
        d, "doc_id", "lang", "n_tok", budget = 40000L, epochs = 2),
      "curriculumOrder" -> Pipeline.curriculumOrder(
        d.withColumn("band", (col("n_tok") / 200).cast("int")),
        "doc_id", "band"),
      "balancedShards" -> Pipeline.balancedShards(
        d, "doc_id", "n_tok", nShards = 8),
      "paddingWasteReport" -> Pipeline.paddingWasteReport(
        d, "doc_id", "n_tok", batchSize = 32))
    // a Window consumes corpus rows iff SOME leaf relation reaches it
    // with no Aggregate on the path (an Aggregate reduces any input to
    // group-cardinality — the parameter-scale offsets/waterfilling
    // arms); merely CONTAINING an Aggregate in a broadcast build side
    // must not exempt the corpus window riding the probe side
    def corpusConsuming(
        p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case _: Aggregate => false
        case leaf if leaf.children.isEmpty => true
        case other => other.children.exists(corpusConsuming)
      }
    plans.foreach { case (name, df) =>
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w
      }
      assert(windows.nonEmpty, s"$name lost its rank windows entirely")
      windows.foreach { w =>
        assert(!corpusConsuming(w.child) || w.partitionSpec.size >= 2,
          s"$name plans a Window over raw corpus rows partitioned by " +
            s"only ${w.partitionSpec.size} key(s) — the salt/sub-class " +
            s"is not reaching the partitioning:\n$w")
      }
    }
  }
}
