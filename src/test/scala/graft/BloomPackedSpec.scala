package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Packed-bitset Bloom ≡ sorted-positions Bloom (the r15 verdict's
  * "switch representation before switching algorithms"): the packed
  * form must produce bit-identical flags on arbitrary corpora, and the
  * kernels themselves must agree with a direct Scala model. */
class BloomPackedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic pseudo-random doc corpus: seeded so reruns agree. */
  private def corpus(seed: Int, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(8))(
        ("tok" + rnd.nextInt(40)).mkString)
      (i.toLong, if (rnd.nextInt(20) == 0) null else words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("bloomDedupPacked ≡ bloomDedup flags on randomized corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val ref = corpus(seed, 120)
      val inc = corpus(seed + 100, 150).unionAll(ref.limit(30))
      for ((m, k) <- Seq((256, 3), (1024, 5), (64, 2))) {
        val a = operators.Pipeline.bloomDedup(inc, ref, "text", m, k)
          .select("doc_id", "bloom_hits", "in_bloom").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
        val b = operators.Pipeline.bloomDedupPacked(inc, ref, "text", m, k)
          .select("doc_id", "bloom_hits", "in_bloom").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
        assert(a.sameElements(b),
          s"packed/positions divergence at seed=$seed m=$m k=$k")
        // true members must always flag (no false negatives)
        val flaggedIds = b.filter(_._3).map(_._1).toSet
        val refTexts = ref.filter(col("text").isNotNull)
          .select("text").collect().map(_.getString(0)).toSet
        val members = inc.filter(col("text").isNotNull)
          .collect().filter(r => refTexts(r.getString(1))).map(_.getLong(0))
        assert(members.forall(flaggedIds), "bloom false negative")
      }
    }
  }

  test("bitset_pack/bitset_count_set agree with a direct model and each other") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val m = 512
    val cases = (0 until 50).map { i =>
      val set = Seq.fill(rnd.nextInt(60))(rnd.nextInt(m).toLong).distinct.sorted
      val probe = Seq.fill(rnd.nextInt(10))(rnd.nextInt(m).toLong).distinct.sorted
      (i, set, probe)
    }
    val out = cases.toDF("i", "set", "probe")
      .withColumn("bits", call_function("bitset_pack", col("set"), lit(m)))
      .withColumn("hits", call_function("bitset_count_set", col("probe"), col("bits")))
      .select("i", "hits").collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    cases.foreach { case (i, set, probe) =>
      assert(out(i) == probe.count(set.toSet), s"case $i")
    }
  }

  test("bitset_pack rejects out-of-range positions loudly") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(5L, 64L))).toDF("p")
        .select(call_function("bitset_pack", col("p"), lit(64))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause).map(identity))
    assert(msgs(e).exists(m => m != null && m.contains("out of range")))
  }
}
