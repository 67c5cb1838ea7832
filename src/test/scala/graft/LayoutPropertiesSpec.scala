package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** ScalaCheck properties for the r18 training-layout and semantic-scrub
  * operators: each checks the DISTRIBUTED plan (partitioned windows +
  * offset joins, broadcast rows, LSH buckets) against an independent
  * LOCAL model computed in plain Scala — ties, zeros, and skewed shapes
  * included, the cases hand fixtures under-sample. */
class LayoutPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: Prop, n: Int = 10): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  test("balancedShards: two-level rank ≡ the local (tokens DESC, id) sort " +
      "and snake fold, under heavy ties and zeros") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      toks <- Gen.listOfN(n, Gen.chooseNum(0L, 20L)) // heavy ties
      s <- Gen.chooseNum(1, 5)
    } yield (toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }, s)
    check(Prop.forAll(gen) { case (rows, s) =>
      val got = Pipeline.balancedShards(rows.toDF("k", "t"), "k", "t", s)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
      val want = rows.sortBy { case (k, t) => (-t, k) }.zipWithIndex
        .map { case ((k, _), i) =>
          val r0 = i.toLong % (2L * s)
          (k, i + 1L, (if (r0 < s) r0 else 2L * s - 1 - r0).toInt)
        }.toSet
      got == want
    })
  }

  test("curriculumOrder: bucket-ascending md5-shuffled permutation ≡ the " +
      "local model") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      bands <- Gen.listOfN(n, Gen.chooseNum(0, 3))
    } yield bands.zipWithIndex.map { case (b, i) => (i.toLong, b) }
    check(Prop.forAll(gen) { rows =>
      val got = Pipeline.curriculumOrder(rows.toDF("k", "b"), "k", "b")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
      // local model: rank within bucket by (md5("b:k"), k), positions
      // offset by ascending-bucket counts
      val byBucket = rows.groupBy(_._2).map { case (b, rs) =>
        b -> rs.map(_._1).sortBy(k => (md5hex(s"$b:$k"), k)) }
      val sortedBuckets = byBucket.keys.toSeq.sorted
      val offsets = sortedBuckets.zip(
        sortedBuckets.map(b => byBucket(b).size.toLong)
          .scanLeft(0L)(_ + _).init).toMap
      val want = byBucket.flatMap { case (b, ks) =>
        ks.zipWithIndex.map { case (k, i) =>
          (k, i + 1L, offsets(b) + i + 1L) }
      }.toSet
      got == want
    })
  }

  test("funnelStepsAnchored: ∃-over-anchors counts ≡ the local brute-force " +
      "chain search, on randomized event streams") {
    import spark.implicits._
    val types = Seq("view", "click", "purchase")
    val gen = for {
      n <- Gen.chooseNum(5, 60)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(0, 4)
        t <- Gen.oneOf(types)
        s <- Gen.chooseNum(0L, 50L)
      } yield (s"u$u", t, s))
    } yield evs.distinct // same (user, type, second) rows collapse anyway
    check(Prop.forAll(gen) { evs =>
      val window = 12L
      val df = evs.map { case (u, t, s) =>
        (u, t, new java.sql.Timestamp(s * 1000L)) }
        .toDF("user_id", "event_type", "ts")
      val got = operators.Relational.funnelStepsAnchored(df, "user_id",
        "ts", "event_type", types, withinSec = window)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      // local brute force: a user reaches level L iff SOME strictly
      // increasing chain t1 < t2 < ... < tL of the right types fits
      // within [t1, t1 + window]
      val byUser = evs.groupBy(_._1)
      def reaches(rows: Seq[(String, String, Long)], level: Int): Boolean = {
        def extend(prev: Long, anchor: Long, step: Int): Boolean =
          if (step == level) true
          else rows.exists { case (_, t, s) =>
            t == types(step) && s > prev && s <= anchor + window &&
              extend(s, anchor, step + 1) }
        rows.exists { case (_, t, s) =>
          t == types.head && extend(s, s, 1) }
      }
      val want = (1 to 3).map(l =>
        l -> byUser.values.count(reaches(_, l)).toLong).toMap
      got == want
    }, n = 8)
  }

  test("paddingWasteReport: both strategies ≡ the local integer model") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      toks <- Gen.listOfN(n, Gen.chooseNum(0L, 30L))
      b <- Gen.chooseNum(1, 4)
    } yield (toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }, b)
    def localWaste(ordered: Seq[Long], b: Int): (Long, Long, Long) = {
      val batches = ordered.grouped(b).toSeq
      val padded = batches.map(g => g.length * g.max - g.sum).sum
      (batches.size.toLong, ordered.sum, padded)
    }
    check(Prop.forAll(gen) { case (rows, b) =>
      val got = Pipeline.paddingWasteReport(rows.toDF("k", "t"), "k", "t", b)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
      val arr = localWaste(rows.sortBy(_._1).map(_._2), b)
      val srt = localWaste(
        rows.sortBy { case (k, t) => (-t, k) }.map(_._2), b)
      def share(w: (Long, Long, Long)): Option[Double] =
        if (w._2 + w._3 > 0) Some(w._3.toDouble / (w._2 + w._3).toDouble)
        else None
      got("arrival") == ((arr._1, arr._2, arr._3, share(arr))) &&
        got("sorted") == ((srt._1, srt._2, srt._3, share(srt)))
    })
  }

  test("semanticDecontaminate: max_cos / n_over / flagged ≡ the local " +
      "sequential-fold cosine model, bit for bit") {
    import spark.implicits._
    // first coordinate bounded away from 0 so no zero-norm vectors
    val vecGen = for {
      h <- Gen.chooseNum(0.1f, 1f)
      t <- Gen.listOfN(3, Gen.chooseNum(-1f, 1f))
    } yield h :: t
    val gen = for {
      nc <- Gen.chooseNum(1, 12)
      ne <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(nc, vecGen)
      es <- Gen.listOfN(ne, vecGen)
      tau <- Gen.oneOf(-0.5, 0.0, 0.5, 0.9)
    } yield (cs.zipWithIndex.map { case (v, i) => (i.toLong, v) }, es, tau)
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
    check(Prop.forAll(gen) { case (corpus, evals, tau) =>
      val got = Pipeline.semanticDecontaminate(
        corpus.toDF("k", "v"), evals.map(Tuple1(_)).toDF("v"), "v", tau)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
      corpus.forall { case (k, cv) =>
        val n2c = dot(cv, cv)
        val cos = evals.map(ev =>
          dot(cv, ev) / (math.sqrt(n2c) * math.sqrt(dot(ev, ev))))
        val want = (cos.max, cos.count(_ >= tau).toLong, cos.max >= tau)
        got(k) == want
      }
    })
  }

  test("embeddingNeardupAgainstCorpus: planted exact cross twins always " +
      "surface; output pairs are cross-side only") {
    import spark.implicits._
    val vecGen = for {
      h <- Gen.chooseNum(0.1f, 1f)
      t <- Gen.listOfN(7, Gen.chooseNum(-1f, 1f))
    } yield h :: t
    val gen = for {
      nNew <- Gen.chooseNum(2, 10)
      vs <- Gen.listOfN(nNew, vecGen)
      twinIdx <- Gen.chooseNum(0, nNew - 1)
      nRef <- Gen.chooseNum(0, 5)
      refs <- Gen.listOfN(nRef, vecGen)
    } yield (vs.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      twinIdx.toLong,
      // the planted twin + unrelated reference noise, ids offset 1000
      ((1000L + twinIdx, vs(twinIdx)) +:
        refs.zipWithIndex.map { case (v, i) => (2000L + i, v) }))
    check(Prop.forAll(gen) { case (newSide, twin, refSide) =>
      val pairs = Pipeline.embeddingNeardupAgainstCorpus(
        newSide.toDF("k", "v"), refSide.toDF("k", "v"), "k", "v",
        tau = 0.999999, dim = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // identical vectors agree on every SRP hyperplane sign → the
      // planted twin is a guaranteed candidate and scores cosine 1.0
      pairs.contains((twin, 1000L + twin)) &&
        pairs.forall { case (a, b) => a < 1000L && b >= 1000L }
    })
  }
}
