package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** The dedup/curation operators as a LIBRARY: callers bring their own
  * DataFrame and column names, not the fixture tables. These tests run
  * every public text operator over a corpus with alien column names
  * ("post_key"/"body") so fixture-name coupling can never creep back
  * in, and assert the semantics on a corpus small enough to verify by
  * inspection. The fixture QueryDefs delegate to the SAME functions,
  * so the DuckDB oracle gate certifies the code paths exercised here.
  */
class TextApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 60-word documents: B edits one word of A (near-dup), C reverses the
  // vocabulary (unrelated), D shares a 10-word passage with C but is
  // otherwise distinct, E/F are exact duplicates of each other
  private def mk(words: Seq[String]) = words.mkString(" ")
  private lazy val corpus = {
    import spark.implicits._
    val a = (1 to 60).map(i => s"w$i")
    val b = a.updated(41, "edited")
    val c = (1 to 60).map(i => s"v$i")
    val d = (1 to 50).map(i => s"u$i") ++ c.slice(20, 30)
    val e = (1 to 60).map(i => s"x$i")
    Seq(
      (10L, mk(a)), (11L, mk(b)), (12L, mk(c)),
      (13L, mk(d)), (14L, mk(e)), (15L, mk(e)))
      .toDF("post_key", "body")
  }

  test("minhashNeardupPairs finds the edited near-dup and the exact dup only") {
    val pairs = Pipeline.minhashNeardupPairs(corpus, "post_key", "body")
      .orderBy("doc_a", "doc_b").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((10L, 11L), (14L, 15L)))
    val j = pairs.map(_.getDouble(2))
    // 1-word edit breaks 5 of 56 shingles per side: 51/61 exactly
    assert(j(0) == 51.0 / 61 && j(0) < 1.0)
    assert(j(1) == 1.0)               // exact duplicate
  }

  test("simhashNeardupPairs agrees on the exact dup; maxHamming bounds checked") {
    val pairs = Pipeline.simhashNeardupPairs(corpus, "post_key", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, h) => a == 14L && b == 15L && h == 0 })
    assert(pairs.forall(_._3 <= 3))
    val e = intercept[IllegalArgumentException] {
      Pipeline.simhashNeardupPairs(corpus, "post_key", "body", maxHamming = 7)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }

  test("sqTrain/sqEncode/sqSearch: bounds, code range, reconstruction, ranking") {
    import spark.implicits._
    val dim = 4
    // vecs on a line so true neighbor order is unambiguous; one
    // constant dimension exercises the degenerate mx = mn branch
    val vecs = (0 until 6).map { i =>
      (i.toLong, Array(i.toFloat, 10f * i, -i.toFloat, 7f))
    }.toDF("vec_id", "embedding")
    val bounds = Pipeline.sqTrain(vecs, "vec_id", "embedding", dim)
    val bRows = bounds.orderBy("pos").collect()
      .map(r => (r.getInt(0), r.getFloat(1), r.getFloat(2)))
    assert(bRows.toSeq == Seq((0, 0f, 5f), (1, 0f, 50f), (2, -5f, 0f), (3, 7f, 7f)))
    val codes = Pipeline.sqEncode(vecs, "vec_id", "embedding", bounds, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // extremes hit 0/255; the constant dim encodes 0; codes in range
    assert(codes(0L) == Seq(0, 0, 255, 0))
    assert(codes(5L) == Seq(255, 255, 0, 0))
    assert(codes.values.forall(_.forall(c => c >= 0 && c <= 255)))
    // vec 1 dim 0: (1-0)/5*255 = 51 exactly
    assert(codes(1L)(0) == 51)
    // search: quantization at 8 bits preserves the line's neighbor
    // order — query 0's nearest are 1 then 2
    val hits = Pipeline.sqSearch(
      Pipeline.sqEncode(vecs, "vec_id", "embedding", bounds, dim),
      vecs.filter(col("vec_id") === 0L), bounds,
      "vec_id", "embedding", k = 2, dim)
      .orderBy("rk").collect().map(r => r.getLong(1))
    assert(hits.toSeq == Seq(1L, 2L))
    // adist of the self-match (excludeSelf=false) is the pure
    // reconstruction error — small but nonzero at 8 bits
    val self = Pipeline.sqSearch(
      Pipeline.sqEncode(vecs, "vec_id", "embedding", bounds, dim),
      vecs.filter(col("vec_id") === 3L), bounds,
      "vec_id", "embedding", k = 1, dim, excludeSelf = false)
      .collect()(0)
    assert(self.getLong(1) == 3L && self.getDouble(2) < 0.01)
    // the fused sq_adist kernel is BIT-IDENTICAL to the two-step
    // spelling (decode to array<double>, then float_dist_sq) — the
    // identity that keeps the p50 oracle valid after the fusion
    val bArr = bounds.orderBy("pos")
      .agg(collect_list(col("mn")).as("mns"), collect_list(col("mx")).as("mxs"))
    val pairs = Pipeline.sqEncode(vecs, "vec_id", "embedding", bounds, dim)
      .crossJoin(broadcast(bArr))
      .crossJoin(broadcast(vecs.select(col("vec_id").as("q_id"),
        col("embedding").as("qe"))))
    val fusedVsTwoStep = pairs.select(
      call_function("sq_adist", col("qe"), col("codes"),
        col("mns"), col("mxs")).as("fused"),
      call_function("float_dist_sq", col("qe"),
        transform(sequence(lit(1), lit(dim)), i => {
          val mn = element_at(col("mns"), i).cast("double")
          val mx = element_at(col("mxs"), i).cast("double")
          mn + element_at(col("codes"), i).cast("double") / 255.0 * (mx - mn)
        })).as("twostep"))
      .collect()
    assert(fusedVsTwoStep.nonEmpty &&
      fusedVsTwoStep.forall(r => r.getDouble(0) == r.getDouble(1)))
    // IVF composition: probing EVERY cell degenerates to the brute
    // sq scan — identical hits and adists (the ivfpqSearch property,
    // for the SQ rung)
    val (member, cents) = Pipeline.ivfIndex(vecs, "vec_id", "embedding",
      k = 2, dim = dim, iters = 1, seedRounds = 2)
    val codesDf = Pipeline.sqEncode(vecs, "vec_id", "embedding", bounds, dim)
    val qs = vecs.filter(col("vec_id") <= 1L)
    val ivfAll = Pipeline.ivfSqSearch(member, codesDf, qs, cents, bounds,
      "vec_id", "embedding", k = 3, dim = dim, nprobe = 2)
      .select("q_id", "vec_id", "adist", "rk").orderBy("q_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val brute = Pipeline.sqSearch(codesDf, qs, bounds,
      "vec_id", "embedding", k = 3, dim = dim)
      .orderBy("q_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(ivfAll.toSeq == brute.toSeq)
    // and with nprobe = 1 every hit is a MEMBER of the query's argmin
    // cell, with the probe_label matching an independent argmin over
    // the trained centroids (a vacuous <=-count assertion could not
    // catch a broken probe selection — review r11)
    val centRows = cents.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val memberOf = member.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def argminCell(qe: Array[Float]): Int = centRows.minBy { case (cl, ce) =>
      (qe.zip(ce).map { case (a, b) => val d = a.toDouble - b; d * d }.sum, cl)
    }._1
    val qVecs = qs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val one = Pipeline.ivfSqSearch(member, codesDf, qs, cents, bounds,
      "vec_id", "embedding", k = 3, dim = dim, nprobe = 1)
      .select("q_id", "probe_label", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(one.nonEmpty)
    one.foreach { case (qId, probe, hit) =>
      assert(probe == argminCell(qVecs(qId)), s"q$qId probed a non-argmin cell")
      assert(memberOf(hit) == probe, s"hit $hit outside the probed cell")
    }
    // wrong-dim QUERY vectors fail loudly, not via NULLS-FIRST ranking
    val badQ = Seq((9L, Array.fill(2)(1.0f))).toDF("vec_id", "embedding")
    val eq = intercept[Exception] {
      Pipeline.sqSearch(codesDf, badQ, bounds, "vec_id", "embedding",
        k = 1, dim).count()
    }
    assert(eq.getMessage.contains("sq:") ||
      Option(eq.getCause).exists(_.getMessage.contains("sq:")))
    // an EMPTY centroid table fails loudly in assignToCentroids —
    // when the assignment is actually READ (a bare count() prunes the
    // cl column and with it the guard; every real consumer reads cl)
    val ec = intercept[Exception] {
      Pipeline.assignToCentroids(vecs, "vec_id", "embedding",
        cents.limit(0)).select("cl").collect()
    }
    assert(ec.getMessage.contains("empty centroid") ||
      Option(ec.getCause).exists(_.getMessage.contains("empty centroid")))
    // a dim mismatch fails LOUDLY with the sq message, not with NULL
    // codes silently poisoning every distance (review r11)
    val e1 = intercept[Exception] {
      Pipeline.sqEncode(vecs, "vec_id", "embedding", bounds, dim = 8).count()
    }
    assert(e1.getMessage.contains("sq:") ||
      Option(e1.getCause).exists(_.getMessage.contains("sq:")))
    val e2 = intercept[Exception] {
      Pipeline.sqTrain(vecs, "vec_id", "embedding", dim = 8).count()
    }
    assert(e2.getMessage.contains("sq:") ||
      Option(e2.getCause).exists(_.getMessage.contains("sq:")))
  }

  test("gopherRepetitionSignals: dup fractions fire on spliced repeats; alien columns") {
    import spark.implicits._
    // exactness is certified by the p63 DuckDB gate; this pins the
    // API shape and each signal's firing conditions
    val splice = (1 to 10).map(i => s"rep$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $splice delta epsilon $splice zeta"),
      (2L, (1 to 30).map(i => s"u$i").mkString(" ")),
      (3L, "tiny doc")).toDF("post_key", "body")
    val out = Pipeline.gopherRepetitionSignals(docs, "body").collect()
      .map(r => r.getLong(0) -> r).toMap
    // caller columns survive; nine signal columns append after them
    assert(out(1L).schema.fieldNames.toSeq ==
      Seq("post_key", "body") ++
        (2 to 4).map(k => s"top_${k}gram_char_frac") ++
        (5 to 10).map(k => s"dup_${k}gram_char_frac"))
    def sig(id: Long, k: Int): Double = out(id).getDouble(2 + (k - 2))
    // doc 1 repeats a 10-word run verbatim: every dup_k fires, incl. 10
    (5 to 10).foreach(k => assert(sig(1L, k) > 0.0, s"dup_$k silent"))
    // doc 2 is all-distinct words: no duplicated k-gram anywhere, but
    // SOME 2-gram is still the most frequent (covering 2 of 30 words)
    (5 to 10).foreach(k => assert(sig(2L, k) == 0.0))
    assert(sig(2L, 2) > 0.0 && sig(2L, 2) < 0.2)
    // a 2-word doc: its single 2-gram covers everything; k > 2 all 0
    assert(sig(3L, 2) == 1.0)
    (3 to 10).foreach(k => assert(sig(3L, k) == 0.0))
    out.values.foreach(r => (2 to 10).foreach(i =>
      assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0)))
  }

  test("gopherLineSignals: duplicate lines and chars counted exactly; alien columns") {
    import spark.implicits._
    val docs = Seq(
      // "bb" twice + unique lines: 4 non-blank lines, 1 duplicate;
      // duplicated chars = 2·2 of 2+2+3+4 = 4/11
      (1L, "bb\nbb\nccc\ndddd"),
      (2L, "one\ntwo\nthree"),           // no duplicates
      (3L, "  \n\n \n"),                 // blank-only: all zeros
      (4L, "x\n x \nx")                  // trim makes all three equal
    ).toDF("post_key", "body")
    val out = Pipeline.gopherLineSignals(docs, "body").collect()
      .map(r => r.getLong(0) -> (r.getLong(r.fieldIndex("n_lines")),
        r.getDouble(r.fieldIndex("dup_line_frac")),
        r.getDouble(r.fieldIndex("dup_line_char_frac")))).toMap
    assert(out(1L) == ((4L, 1.0 / 4, 4.0 / 11)))
    assert(out(2L) == ((3L, 0.0, 0.0)))
    assert(out(3L) == ((0L, 0.0, 0.0)))
    assert(out(4L) == ((3L, 2.0 / 3, 1.0)))
    // paragraph mode: same machinery over a different separator
    val para = Pipeline.gopherLineSignals(
      Seq((9L, "p1 text\n\np2\n\np1 text")).toDF("post_key", "body"),
      "body", sep = "\n\n").collect()(0)
    assert(para.getLong(para.fieldIndex("n_lines")) == 3 &&
      para.getDouble(para.fieldIndex("dup_line_frac")) == 1.0 / 3)
  }

  test("trainQualityClassifier: separates curated from crawl; deterministic; alien columns") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def doc(vocab: Seq[String], n: Int) =
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val goodV = (1 to 8).map(i => s"fine$i")
    val badV = (1 to 8).map(i => s"spam$i")
    val pos = (0 until 20).map(_ => Tuple1(doc(goodV, 12 + rnd.nextInt(8))))
      .toDF("content")
    val neg = (0 until 20).map(_ => Tuple1(doc(badV, 12 + rnd.nextInt(8))))
      .toDF("content")
    val buckets = 256
    def train() = Pipeline.trainQualityClassifier(pos, neg, "content",
        buckets = buckets, maxGram = 2, iters = 30, lr = 2.0)
      .orderBy("b").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val wts = train()
    // bit-identical weights on a re-run (md5 features, decimal sums,
    // quantized sigmoid, driver-side updates — nothing RNG-dependent)
    assert(wts == train())
    assert(wts.size == buckets + 1) // intercept rides at index `buckets`
    // held-out docs from each vocabulary separate cleanly by score
    val held = Seq((1L, doc(goodV, 15)), (2L, doc(badV, 15)),
      (3L, doc(goodV, 10)), (4L, doc(badV, 10))).toDF("post_key", "body")
    val scores = Pipeline.classifierScore(
        Pipeline.hashedNgramFeatures(held, "post_key", "body",
          buckets = buckets, maxGram = 2),
        wts.toDF("b", "w"), buckets = buckets)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.size == 4)
    assert(Seq(1L, 3L).map(scores).min > Seq(2L, 4L).map(scores).max,
      s"curated held-out docs must outscore crawl ones: $scores")
  }

  test("cleanText: optional C4 blocklist + URL-dedup pre-stages compose; defaults untouched") {
    import spark.implicits._
    val l1 = "alpha beta gamma delta epsilon zeta eta."
    val l2 = "one two three four five six seven eight."
    val l3 = "red orange yellow green blue indigo violet."
    val page = Seq(l1, l2, l3).mkString("\n")
    val badPage = Seq("this slow page crawls badly today ok.",
      l2, l3).mkString("\n")
    val docs = Seq(
      (1L, page, "https://a.example.com/x"),
      (2L, page, "HTTPS://A.example.com/x/"),  // same canonical URL → dropped
      (3L, badPage, "https://a.example.com/y"), // blocklist hit → dropped
      (4L, Seq(l2, l3, l1).mkString("\n"), "https://a.example.com/z"))
      .toDF("post_key", "body", "url")
    val out = operators.Curation.cleanText(docs, "post_key", "body",
        badwords = Seq("slow"), urlCol = "url")
      .collect().map(r => r.getLong(0)).toSet
    assert(out == Set(1L, 4L),
      s"URL-dup doc 2 and blocked doc 3 must be gone, got $out")
    // with the stages off, the same docs all survive (pre-stages are
    // genuinely optional — the p13 gate pins the unextended chain)
    val plain = operators.Curation.cleanText(docs, "post_key", "body")
      .collect().map(r => r.getLong(0)).toSet
    assert(plain == Set(1L, 2L, 3L, 4L))
  }

  test("decontaminateSpansClosed: cuts the cross-seam gram the single pass leaks") {
    import spark.implicits._
    // eval grams (n=2): (q1,q2), (q2,z), (z,a), (a,b). Doc "a q1 q2 b"
    // cuts [1,3) in pass one, re-joining to "a b" — which IS an eval
    // gram the single pass never re-probes (the documented per-kept-
    // segment guarantee). The closed variant probes again and cuts it.
    val evalSet = Seq(Tuple1("q1 q2 z a b")).toDF("text")
    val docs = Seq((1L, "a q1 q2 b"), (2L, "clean words here"))
      .toDF("doc_id", "text")
    val single = Pipeline.decontaminateSpans(docs, evalSet, "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        r.getString(r.fieldIndex("text_clean"))).toMap
    assert(single(1L) == "a b", s"fixture lost its seam leak: $single")
    val closed = Pipeline.decontaminateSpansClosed(docs, evalSet, "text",
        n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(r.fieldIndex("text_clean")),
          r.getLong(r.fieldIndex("n_flagged_grams")),
          r.getInt(r.fieldIndex("n_passes"))))).toMap
    assert(closed(1L)._1 == "", s"closed variant must cut the seam gram: $closed")
    assert(closed(1L)._2 == 2L, s"one flag per pass expected: $closed")
    // clean docs pass through byte-identical, same pass count column
    assert(closed(2L)._1 == "clean words here")
    // the final confirming pass (flags nothing) is counted
    assert(closed(1L)._3 == 3)
  }

  test("badwordsFilter: whole-word, case-insensitive, NULL-safe; dedupByUrl canonicalizes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "this page is SLOW today"),  // case-insensitive whole-word hit
      (2L, "moving slowly along"),      // substring — must NOT match
      (3L, "clean words only"),
      (4L, null.asInstanceOf[String]))  // NULL text never blocks
      .toDF("post_key", "body")
    def flags(ci: Boolean) = Pipeline.badwordsFilter(docs, "body",
        Seq("slow", "bad"), caseInsensitive = ci)
      .collect().map(r => r.getLong(0) ->
        r.getBoolean(r.fieldIndex("blocked"))).toMap
    assert(flags(ci = true) ==
      Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // case-sensitive: "SLOW" no longer matches "slow"
    assert(flags(ci = false) ==
      Map(1L -> false, 2L -> false, 3L -> false, 4L -> false))
    // alien caller columns survive
    assert(Pipeline.badwordsFilter(docs, "body", Seq("slow"))
      .columns.toSeq == Seq("post_key", "body", "blocked"))

    val urls = Seq(
      (10L, "HTTPS://A.example.com/X/"),   // case + trailing slash
      (11L, "https://a.example.com/x"),    // same canonical URL
      (12L, "https://a.example.com/x#f"),  // fragment stripped → same
      (13L, "https://a.example.com/y"),    // distinct
      (14L, null.asInstanceOf[String]),    // NULL urls never collapse
      (15L, null.asInstanceOf[String]))
      .toDF("post_key", "url")
    val kept = Pipeline.dedupByUrl(urls, "post_key", "url")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 13L, 14L, 15L),
      s"expected min-id per canonical URL + all NULL rows, got $kept")
  }

  test("trainLangIdClassifier + langIdScore: one-vs-rest char-gram langid " +
      "separates a multilingual fixture; deterministic; empty text scores bias-only") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // three synthetic "languages" with disjoint character inventories
    // (the signal char-gram langid actually keys on)
    def doc(alpha: String, n: Int) = (0 until n).map(_ =>
      (0 until 3).map(_ => alpha(rnd.nextInt(alpha.size))).mkString)
      .mkString(" ")
    val inv = Map("aa" -> "abcde", "mm" -> "mnopq", "zz" -> "vwxyz")
    val labeled = inv.toSeq.sortBy(_._1).flatMap { case (l, alpha) =>
      (0 until 12).map(_ => (doc(alpha, 10 + rnd.nextInt(5)), l))
    }.toDF("body", "tongue")
    val buckets = 128
    def train() = Pipeline.trainLangIdClassifier(labeled, "body", "tongue",
        buckets = buckets, kMin = 1, kMax = 2, iters = 8, lr = 2.0)
      .orderBy("lang", "b").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    val wts = train()
    assert(wts == train(), "training must be bit-deterministic")
    assert(wts.map(_._1).distinct == Seq("aa", "mm", "zz"))
    assert(wts.size == 3 * (buckets + 1))
    // held-out docs classify to their language; empty text never drops
    val held = Seq(
      (1L, doc(inv("aa"), 8)), (2L, doc(inv("mm"), 8)),
      (3L, doc(inv("zz"), 8)), (4L, "")).toDF("post_key", "body")
    val out = Pipeline.langIdScore(held, "post_key", "body",
        wts.toDF("lang", "b", "w"), buckets = buckets, kMin = 1, kMax = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), if (r.isNullAt(3)) None
          else Some(r.getDouble(3))))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), s"no doc may drop: $out")
    assert(out(1L)._1 == "aa" && out(2L)._1 == "mm" && out(3L)._1 == "zz",
      s"held-out docs must classify to their language: $out")
    // margins on real docs are positive (argmax strictly won)
    assert(Seq(1L, 2L, 3L).forall(k => out(k)._3.exists(_ > 0)), s"$out")
    // the featureless doc got the bias-only argmax (highest intercept
    // wins: the trained intercepts are deterministic, just assert it
    // scored SOME language with a defined score)
    assert(inv.keySet.contains(out(4L)._1))
  }

  test("lmPerplexity: reference-like docs land in head, OOV in tail; " +
      "unknown language and empty docs unscored; alien columns") {
    import spark.implicits._
    // reference LM for "tongue" aa only: repetitive in-domain prose
    val refText = (1 to 10).flatMap(_ => Seq("the", "cat", "sat", "on",
      "the", "mat")).mkString(" ")
    val ref = Seq((100L, refText, "aa"), (101L, refText, "aa"))
      .toDF("post_key", "body", "tongue")
    val docs = Seq(
      (1L, "the cat sat on the mat", "aa"),      // in-LM → best logprob
      (2L, "the cat sat zz purple mat", "aa"),   // partly OOV
      (3L, "zz yy xx ww vv uu", "aa"),           // fully OOV → worst
      (4L, "the cat sat on the mat", "bb"),      // no LM for bb → unscored
      (5L, "   ", "aa"))                          // empty → unscored
      .toDF("post_key", "body", "tongue")
    val out = Pipeline.lmPerplexity(ref, docs, "post_key", "body", "tongue")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getString(5))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    val (n1, lp1, ppl1, b1) = out(1L)
    val (_, lp2, _, b2) = out(2L)
    val (_, lp3, ppl3, b3) = out(3L)
    assert(n1 == 6L)
    assert(lp1 > lp2 && lp2 > lp3,
      s"logprob must fall with OOV mass: $out")
    assert(ppl1 < ppl3)
    // 3 scored docs in lang aa → ntile thirds are exactly one doc each
    assert((b1, b2, b3) == (("head", "middle", "tail")))
    // scoring is deterministic on a re-run
    val again = Pipeline.lmPerplexity(ref, docs, "post_key", "body", "tongue")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again == Map(1L -> lp1, 2L -> lp2, 3L -> lp3))
  }

  test("packingReport: fill/full/separator counts and rates on a hand corpus") {
    import spark.implicits._
    // three docs of 3/5/2 ids + one -9 separator each = 13 slots; L=4
    // over one shard → chunks of 4,4,4,1 — 3 full, fill_rate 13/16
    val docs = Seq(
      (1L, 0, Seq(10, 11, 12)),
      (2L, 0, Seq(20, 21, 22, 23, 24)),
      (3L, 0, Seq(30, 31)))
      .toDF("post_key", "shard", "ids")
    val packed = Pipeline.packTokenIds(docs, "post_key", "shard", "ids",
      contextLen = 4, sepId = -9)
    val r = Pipeline.packingReport(packed, contextLen = 4, sepId = -9)
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L) // n_chunks, n_full
    assert(r.getLong(2) == 13L && r.getLong(3) == 3L) // total, separators
    assert(r.getDouble(4) == 13.0 / 16.0)
    assert(r.getDouble(5) == 3.0 / 13.0)
    intercept[IllegalArgumentException](
      Pipeline.packingReport(packed, contextLen = 0, sepId = -9))
  }

  test("zipfSlope: exact power-law corpus fits slope −1 and intercept ln(c); " +
      "head truncation; topK < 2 rejected; deterministic") {
    import spark.implicits._
    // freq = 60/rank for ranks 1..4 (counts 60, 30, 20, 15): every
    // ln-ln point sits exactly on y = ln 60 − x (mod round-9)
    val wordz = Seq("w1" -> 60, "w2" -> 30, "w3" -> 20, "w4" -> 15)
    val text = wordz.map { case (w, n) => Seq.fill(n)(w).mkString(" ") }
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = Pipeline.zipfSlope(docs, "text", topK = 4).collect().head
    assert(r.getLong(0) == 4L)
    // the dsum contract quantizes each regression sum to 4 decimal
    // places, so the fit sits within ~1e-3 of the ideal line — pin the
    // EXACT value via a hand-fold of the same arithmetic
    def round9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = (1 to 4).map(k => round9(math.log(k.toDouble)))
    val ys = Seq(60, 30, 20, 15).map(c => round9(math.log(c.toDouble)))
    val (sx, sy) = (q4(xs.sum), q4(ys.sum))
    val sxy = q4(xs.zip(ys).map { case (a, b) => a * b }.sum)
    val sxx = q4(xs.map(a => a * a).sum)
    val slope = (4.0 * sxy - sx * sy) / (4.0 * sxx - sx * sx)
    assert(r.getDouble(1) == slope && math.abs(slope + 1.0) < 1e-3,
      s"slope=${r.getDouble(1)} want $slope")
    assert(r.getDouble(2) == (sy - slope * sx) / 4.0 &&
      math.abs(r.getDouble(2) - math.log(60)) < 1e-3,
      s"intercept=${r.getDouble(2)}")
    // head truncation: only the top-2 ranks enter the fit
    val r2 = Pipeline.zipfSlope(docs, "text", topK = 2).collect().head
    // a two-point fit amplifies the 4-dp sum quantization (small
    // denominator), so the tolerance is looser here
    assert(r2.getLong(0) == 2L && math.abs(r2.getDouble(1) + 1.0) < 5e-3)
    intercept[IllegalArgumentException](
      Pipeline.zipfSlope(docs, "text", topK = 1))
    // a <2-distinct-word corpus fails loudly instead of returning NaN
    val degenerate = Seq((1L, "same same same same")).toDF("doc_id", "text")
    val eDeg = intercept[Exception](
      Pipeline.zipfSlope(degenerate, "text").collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(eDeg).exists(_.contains("distinct word")))
    val again = Pipeline.zipfSlope(docs, "text", topK = 4).collect().head
    assert(again.getDouble(1) == r.getDouble(1) &&
      again.getDouble(2) == r.getDouble(2))
  }

  test("semDedup: prunes same-direction groups to the farthest-from-centroid " +
      "representative; orthogonal vectors survive; alien columns") {
    import spark.implicits._
    // one cluster (k = 1): vecs 0/1/4 are colinear (pairwise cos = 1,
    // a transitive dup GROUP), 2 and 3 are orthogonal/opposed to them
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(2f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(-1f, 0f)), (4L, Array(4f, 0f)))
      .toDF("post_key", "v")
    val out = Pipeline.semDedup(vecs, "post_key", "v",
      k = 1, dim = 2, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // centroid = mean (1.2, 0.2); of the {0,1,4} group only 4 (d2 = 7.88,
    // the farthest) survives; 2 and 3 are unpaired and pass through
    assert(out.map(_._1).toSet == Set(2L, 3L, 4L))
    assert(out.forall(_._2 == 0))
    val d2 = out.map(t => t._1 -> t._3).toMap
    assert(math.abs(d2(4L) - 7.88) < 1e-9, s"d2: $d2")
  }

  test("semDedup clusterCap: a mega-cluster is salted into bounded sub-blocks; " +
      "survivors only grow; n ≤ cap stays bit-identical; cap < 2 rejected") {
    import spark.implicits._
    // 12 colinear vectors: ONE transitive dup group in ONE cluster —
    // exactly the degenerate all-pairs shape the cap exists for
    val vecs = (1 to 12).map(i => (i.toLong, Array(i.toFloat, 0f)))
      .toDF("post_key", "v")
    val base = Pipeline.semDedup(vecs, "post_key", "v", k = 1, dim = 2,
      tau = 0.99).collect().map(_.getLong(0)).toSet
    assert(base.size == 1) // one group → one representative
    val capped = Pipeline.semDedup(vecs, "post_key", "v", k = 1, dim = 2,
      tau = 0.99, clusterCap = 4).collect().map(_.getLong(0)).toSet
    // expected: per occupied md5 sub-block (nSub = ⌈12/4⌉ = 3) the
    // farthest-from-centroid member survives; d2 cross-checked from the
    // independently-gated kmeansCluster assignment, block membership
    // from the engine's own salt expression
    val d2 = Pipeline.kmeansCluster(vecs, "post_key", "v", k = 1, dim = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val salts = (1 to 12).map(_.toLong).toDF("post_key")
      .select(col("post_key"),
        Pipeline.subClusterSalt(col("post_key"), lit(3)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = salts.groupBy(_._2).values
      .map(_.keys.toSeq.maxBy(id => (d2(id), -id))).toSet
    assert(capped == expected, s"capped=$capped expected=$expected salts=$salts")
    assert(base.subsetOf(capped)) // the cap only ever KEEPS more
    assert(capped.size == salts.values.toSet.size)
    // a cluster at exactly the cap takes the unsalted arm → identical
    val atCap = Pipeline.semDedup(vecs, "post_key", "v", k = 1, dim = 2,
      tau = 0.99, clusterCap = 12).collect().map(_.getLong(0)).toSet
    assert(atCap == base)
    intercept[IllegalArgumentException](
      Pipeline.semDedup(vecs, "post_key", "v", k = 1, dim = 2, tau = 0.99,
        clusterCap = 1))
  }

  test("temperatureSample: α interpolates natural → uniform; quotas clamp " +
      "without redistribution; nested prefixes; alien columns") {
    import spark.implicits._
    // 90 docs of stratum A, 10 of B
    val corpus = ((1 to 90).map(i => (i.toLong, "A")) ++
      (91 to 100).map(i => (i.toLong, "B"))).toDF("post_key", "tongue")
    def shares(alpha: Double, budget: Long = 50L) =
      Pipeline.temperatureSample(corpus, "post_key", "tongue",
        budget, alpha)
        .groupBy("tongue").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // α = 1: proportional quotas floor(50·0.9)=45 / floor(50·0.1)=5
    assert(shares(1.0) == Map("A" -> 45L, "B" -> 5L))
    // α = 0.5: s = (sqrt 90, sqrt 10) → B's quota floor(50/4) = 12 is
    // boosted past its 10-doc supply and clamps to it
    assert(shares(0.5) == Map("A" -> 37L, "B" -> 10L))
    // α = 0: uniform 25/25, but B clamps to its 10 docs — no
    // redistribution back to A
    assert(shares(0.0) == Map("A" -> 25L, "B" -> 10L))
    // rank prefixes nest: a smaller budget's sample is a subset
    def ids(budget: Long) =
      Pipeline.temperatureSample(corpus, "post_key", "tongue",
        budget, 0.5).collect().map(_.getLong(0)).toSet
    assert(ids(20L).subsetOf(ids(50L)))
    val e = intercept[IllegalArgumentException] {
      Pipeline.temperatureSample(corpus, "post_key", "tongue", 50L, 1.5)
    }
    assert(e.getMessage.contains("alpha"))
  }

  test("dsirImportanceScores: target-like docs score higher; alien columns") {
    import spark.implicits._
    // target distribution: prose about cats; raw pool: one cat-like
    // doc, one dog doc, one mixed — the cat doc must win the ratio
    val target = Seq(
      (100L, "the cat sat on the mat and the cat purred"),
      (101L, "a cat chases the red dot and the cat naps"))
      .toDF("post_key", "body")
    val raw = Seq(
      (1L, "the cat sat on the mat and the cat napped"),
      (2L, "stock markets rallied as bond yields fell sharply today"),
      (3L, "the dog and the cat shared the warm mat"))
      .toDF("post_key", "body")
    val got = Pipeline.dsirImportanceScores(raw, target, "post_key", "body")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    // n_grams = unigrams + bigrams = n + (n-1)
    assert(got(1L)._1 == 10 + 9)
    // ordering: cat-prose > mixed > finance
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2,
      s"importance order violated: $got")
    // out-of-domain text scores NEGATIVE (less likely under target)
    assert(got(2L)._2 < 0)
    // alien columns on both sides + custom score column
    val alien = Pipeline.dsirImportanceScores(
      raw.toDF("k", "txt"), target.toDF("k2", "contents"),
      idCol = "k", textCol = "txt", targetTextCol = "contents",
      scoreCol = "w")
    assert(alien.columns.toSeq == Seq("doc_id", "n_grams", "w"))
    assert(alien.count() == 3)
    // a zero-word raw doc carries no grams and is absent, documented
    val withEmpty = raw.union(Seq((9L, "  ")).toDF("post_key", "body"))
    assert(Pipeline.dsirImportanceScores(withEmpty, target, "post_key", "body")
      .count() == 3)
  }

  test("dedupParagraphsGlobal: boilerplate collapses to first occurrence; blanks exempt") {
    import spark.implicits._
    val banner = "accept all cookies to continue"
    val pages = Seq(
      (1L, s"unique first paragraph\n$banner\n\nclosing thoughts one"),
      (2L, s"$banner\nfresh second-page prose\n\nclosing thoughts one"),
      (3L, s"$banner"),          // nothing but boilerplate
      (4L, "   \n "))            // whitespace-only lines: structure, kept
      .toDF("page_id", "content")
    val got = operators.Pipeline.dedupParagraphsGlobal(pages, "page_id", "content")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // page 1 owns the banner AND 'closing thoughts one' (first by id)
    assert(got(1L) == (4L, 4L,
      s"unique first paragraph\n$banner\n\nclosing thoughts one"))
    // page 2 loses both shared lines but keeps its blank separator
    assert(got(2L) == (4L, 2L, "fresh second-page prose\n"))
    // a pure-boilerplate page keeps NOTHING — n_kept_lines 0, empty text
    assert(got(3L) == (1L, 0L, ""))
    // whitespace-only lines are never deduplicated across docs
    assert(got(4L) == (2L, 2L, "   \n "))
    // deterministic: first occurrence is by (doc id, line position),
    // so rerunning yields the identical assignment
    val again = operators.Pipeline.dedupParagraphsGlobal(pages, "page_id", "content")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again == got.view.mapValues(_._3).toMap)
    // alien separator
    val piped = Seq((1L, "a|b|a"), (2L, "b|c")).toDF("k", "t")
    val ps = operators.Pipeline.dedupParagraphsGlobal(piped, "k", "t", sep = "|")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(ps == Map(1L -> "a|b", 2L -> "c"))
  }

  test("dedupParagraphsGlobal: randomized invariants — uniqueness, ownership, order") {
    import spark.implicits._
    // random corpora from a small line vocabulary so cross-doc
    // duplicates are dense; invariants checked in Scala per run
    val rnd = new scala.util.Random(31)
    val lineVocab = Vector("the quick brown fox", "cookie banner here",
      "all rights reserved", "fresh unique prose", "menu home about", "")
    val docs = (0L until 30L).map { i =>
      (i, (0 until 1 + rnd.nextInt(6))
        .map(_ => lineVocab(rnd.nextInt(lineVocab.size))).mkString("\n"))
    }
    val out = operators.Pipeline.dedupParagraphsGlobal(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // every input doc present, n_lines matches the raw split
    assert(out.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, text) =>
      assert(out(id)._1 == text.split("\n", -1).length, s"doc $id n_lines")
    }
    val keptByDoc = out.view.mapValues(_._3.split("\n", -1).toSeq
      .filter(_.trim.nonEmpty)).toMap
    // 1. each distinct CONTENT line survives exactly once corpus-wide
    val allKept = keptByDoc.values.flatten.toSeq
    assert(allKept.distinct.size == allKept.size, "a content line survived twice")
    // 2. the surviving set is exactly the corpus's distinct content lines
    val want = docs.flatMap(_._2.split("\n", -1)).filter(_.trim.nonEmpty).distinct
    assert(allKept.toSet == want.toSet, "kept lines != distinct corpus lines")
    // 3. ownership: each line's keeper is the (doc_id, position)-first
    val firstOwner = docs.flatMap { case (id, t) =>
      t.split("\n", -1).zipWithIndex.filter(_._1.trim.nonEmpty)
        .map { case (l, p) => (l, (id, p)) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    keptByDoc.foreach { case (id, ls) =>
      ls.foreach(l => assert(firstOwner(l)._1 == id, s"line '$l' kept off-owner"))
    }
    // 4. per doc, kept lines appear in original relative order
    docs.foreach { case (id, t) =>
      val orig = t.split("\n", -1).toSeq
      val kept = keptByDoc(id)
      val idxs = kept.foldLeft(Seq.empty[Int]) { (acc, l) =>
        acc :+ orig.indexWhere(_ == l, acc.lastOption.map(_ + 1).getOrElse(0))
      }
      assert(idxs.forall(_ >= 0) && idxs == idxs.sorted, s"doc $id order")
    }
  }

  test("dedupSubstringsGlobal: repeated runs survive only at first occurrence") {
    // at minLen = 10 the fixture has four duplicated-substring shapes:
    // B repeats A except one word, D quotes a 10-word passage of C
    // mid-page, F repeats E wholesale, and A/C/E are first occurrences
    val out = Pipeline.dedupSubstringsGlobal(corpus, "post_key", "body",
        minLen = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4)))
    val byId = out.map(t => t._1 -> t).toMap
    val a = (1 to 60).map(i => s"w$i")
    // first occurrences and unrelated docs pass through byte-identical
    Seq(10L, 12L, 14L).foreach { id =>
      val (_, n, cut, spans, txt) = byId(id)
      assert(n == 60 && cut == 0 && spans == "")
      assert(txt == corpus.filter(col("post_key") === id)
        .collect()(0).getString(1))
    }
    // B: every window avoiding the edited word 41 is a repeat of A —
    // flagged {0..31} ∪ {42..50} merges to [0,41) + [42,60), keeping
    // exactly the edited word
    assert(byId(11L) == ((11L, 60L, 59L, "0-41,42-60", "edited")))
    // D: its quoted 10-word passage of C is one duplicated window at
    // position 50 — excised, the original 50 words kept
    assert(byId(13L) == ((13L, 60L, 10L, "50-60",
      (1 to 50).map(i => s"u$i").mkString(" "))))
    // F: a wholesale repeat of E — every window flagged, nothing kept
    assert(byId(15L) == ((15L, 60L, 60L, "0-60", "")))
    assert(out.map(_._1).toSeq == Seq(10L, 11L, 12L, 13L, 14L, 15L))
    assert(a.nonEmpty) // fixture guard: A really is the w-vocabulary
    // keepFirst = false (drop-all-copies): the FIRST holders lose
    // their copies too — A keeps only its unshared word, C loses the
    // passage D quoted, both exact dups empty out
    val strict = Pipeline.dedupSubstringsGlobal(corpus, "post_key", "body",
        minLen = 10, keepFirst = false)
      .collect().map(r => (r.getLong(0), r.getString(4))).toMap
    assert(strict(10L) == "w42" && strict(11L) == "edited")
    assert(strict(12L) ==
      ((1 to 20) ++ (31 to 60)).map(i => s"v$i").mkString(" "))
    assert(strict(13L) == (1 to 50).map(i => s"u$i").mkString(" "))
    assert(strict(14L) == "" && strict(15L) == "")
  }

  test("Curation.cleanTextManaged: release() drops the checkpoint blocks (ADVICE r14)") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("alpha beta gamma delta epsilon zeta eta.",
        "one two three four five six seven eight.",
        "red orange yellow green blue indigo violet.").mkString("\n")),
      (2L, Seq("cats dogs birds fish mice foxes wolves.",
        "north south east west up down sideways.",
        "iron copper silver gold tin lead zinc.").mkString("\n")))
      .toDF("post_key", "body")
    val h = operators.Curation.cleanTextManaged(docs, "post_key", "body")
    assert(h.frame.count() == 2)
    // the chain's localCheckpoint sits in h.frame's lineage: find its
    // materialized RDDs the same way the release path does
    val rdds = h.frame.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    assert(rdds.nonEmpty, "expected a localCheckpoint in the lineage")
    assert(rdds.exists(_.getStorageLevel !=
      org.apache.spark.storage.StorageLevel.NONE),
      "checkpoint blocks should be pinned before release")
    h.release()
    assert(rdds.forall(_.getStorageLevel ==
      org.apache.spark.storage.StorageLevel.NONE),
      "release() must unpersist every checkpoint block")
    // plain cleanText still returns the same frame shape
    assert(operators.Curation.cleanText(docs, "post_key", "body")
      .columns.toSeq == h.frame.columns.toSeq)
  }

  test("Curation.cleanText: the composed scrub chains all four layers") {
    import spark.implicits._
    val banner = "accept all cookies to continue reading."
    val l1 = "alpha beta gamma delta epsilon zeta eta."
    val l2 = "one two three four five six seven eight."
    val l3 = "red orange yellow green blue indigo violet."
    val l4 = "cats dogs birds fish mice foxes wolves."
    val l5 = "north south east west up down sideways."
    val l6 = "iron copper silver gold tin lead zinc."
    val s1 = "p q r s t u v w x y."
    val m1 = "m n o aa bb cc dd ee ff gg."
    val m2 = "hh ii jj kk ll mm nn oo pp."
    val t1 = "zz yy p q r s t u v w."
    val u5a = "stone brick slate marble chalk flint basalt."
    val u5b = "oak ash elm birch pine cedar willow."
    val docs = Seq(
      (1L, Seq(l1, banner, l2, l3).mkString("\n")),
      (2L, Seq(banner, l4, l5, l6).mkString("\n")),
      (3L, "short line\nno punct here\nanother bad line"),
      (4L, Seq(s1, m1, m2).mkString("\n")),
      (5L, Seq(t1, u5a, u5b).mkString("\n")))
      .toDF("post_key", "body")
    val evalSet = Seq(Tuple1("red orange yellow green blue")).toDF("prompt")
    val out = operators.Curation.cleanText(docs, "post_key", "body",
        evalSet = Some(evalSet), substringMinLen = 7, decontaminateN = 5,
        evalTextCol = "prompt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("n_flagged_grams")),
          r.getString(r.fieldIndex("text_clean")))).toMap
    // doc 3 (no terminal punctuation anywhere) fails the C4 page gate
    assert(out.keySet == Set(1L, 2L, 4L, 5L))
    // doc 2: the banner line deduped away (first occurrence is doc 1)
    assert(out(2L) == ((0L, Seq(l4, l5, l6).mkString("\n"))))
    // doc 4: first holder of the shared 7-word run — untouched
    assert(out(4L) == ((0L, Seq(s1, m1, m2).mkString("\n"))))
    // doc 5: the quoted run excised mid-line, the rest of the page kept
    assert(out(5L) == ((0L,
      "zz yy " + "w.\n" + u5a + "\n" + u5b)))
    // doc 1: the eval 5-gram excised span-granularly, not the doc
    assert(out(1L) == ((1L,
      Seq(l1, banner, l2).mkString("\n") + " " + "indigo violet.")))
  }

  test("dedupSubstringsGlobal: randomized invariant — no duplicated L-gram survives") {
    import spark.implicits._
    val L = 3
    val rnd = new scala.util.Random(421)
    // tiny vocabulary → massive duplication, every branch hot; the
    // multi-byte and ASTRAL entries (2 UTF-16 units) prove the char
    // spans the excision slices with are code-point-correct, not
    // byte- or UTF-16-unit-based
    val vocab = Vector("a", "b", "é", "日本", "𝄞")
    (1 to 3).foreach { trial =>
      val docs = (0 until 10).map { i =>
        val n = 5 + rnd.nextInt(12)
        (i.toLong,
          // 80% a/b keeps duplication dense; 20% unicode keeps the
          // offset math honest
          (0 until n).map { _ =>
            val w = rnd.nextInt(10)
            vocab(if (w < 8) w % 2 else 2 + rnd.nextInt(3))
          }.mkString(" "))
      }
      val out = Pipeline.dedupSubstringsGlobal(
          docs.toDF("post_key", "body"), "post_key", "body", minLen = L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getString(4)))
        .sortBy(_._1)
      val gramCount = scala.collection.mutable.Map.empty[String, Int]
      out.foreach { case (id, nWords, nCut, spans, deduped) =>
        val ws = docs.find(_._1 == id).get._2.split("\\s+").filter(_.nonEmpty)
        assert(nWords == ws.length, s"trial $trial doc $id n_words")
        val cuts =
          if (spans.isEmpty) Seq.empty[(Int, Int)]
          else spans.split(",").toSeq.map { s =>
            val Array(x, y) = s.split("-"); (x.toInt, y.toInt) }
        assert(nCut == cuts.map(c => c._2 - c._1).sum)
        // cuts are in-bounds, ascending, strictly disjoint (merged)
        cuts.foreach { case (s, e) => assert(0 <= s && s < e && e <= nWords) }
        cuts.sliding(2).foreach {
          case Seq((_, e1), (s2, _)) => assert(s2 > e1)
          case _ => ()
        }
        val keptRuns = ((0 +: cuts.map(_._2)) zip (cuts.map(_._1) :+ ws.length))
          .filter(r => r._1 < r._2)
        // clean docs byte-identical; cut docs = kept slices re-joined
        if (cuts.isEmpty) assert(deduped == docs.find(_._1 == id).get._2)
        else assert(deduped ==
          keptRuns.map(r => ws.slice(r._1, r._2).mkString(" ")).mkString(" "))
        keptRuns.foreach { r =>
          ws.slice(r._1, r._2).sliding(L).filter(_.length == L).foreach { g =>
            val k = g.mkString(" ")
            gramCount(k) = gramCount.getOrElse(k, 0) + 1
          }
        }
      }
      // THE ExactSubstr guarantee: across the whole cleaned corpus, no
      // ≥L-word substring (gram of a kept run) occurs twice
      val dups = gramCount.filter(_._2 > 1)
      assert(dups.isEmpty, s"trial $trial: duplicated grams survived: $dups")
    }
  }

  test("decontaminateSpans: contaminated windows excised, clean docs byte-identical") {
    import spark.implicits._
    // the eval "benchmark" is exactly C's 10-word passage v21..v30 —
    // contaminates C itself (position 20) and D's quote (position 50)
    val evalSet = Seq((1L, (21 to 30).map(i => s"v$i").mkString(" ")))
      .toDF("q", "prompt")
    val out = Pipeline.decontaminateSpans(corpus, evalSet,
        textCol = "body", n = 10, evalTextCol = "prompt")
      .orderBy("post_key").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L, 12L, 13L, 14L, 15L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_flagged_grams"), r.getAs[String]("cut_spans"),
        r.getAs[String]("text_clean"))).toMap
    val orig = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // clean docs: byte-identical passthrough, zero flags
    Seq(10L, 11L, 14L, 15L).foreach { id =>
      assert(byId(id) == ((0L, "", orig(id))), s"doc $id not untouched")
    }
    // C: the passage sits at words [20, 30) — cut, surroundings kept
    assert(byId(12L) == ((1L, "20-30",
      ((1 to 20) ++ (31 to 60)).map(i => s"v$i").mkString(" "))))
    // D: the quote sits at words [50, 60) — cut, the original 50 kept
    assert(byId(13L) == ((1L, "50-60",
      (1 to 50).map(i => s"u$i").mkString(" "))))
    // caller columns survive alongside the three new ones
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("post_key", "body", "n_flagged_grams", "cut_spans", "text_clean"))
  }

  test("decontaminateSpansAgainstCorpus ≡ decontaminateSpans on identical inputs") {
    import spark.implicits._
    // the broadcast probe and the shuffle-join strategy are the SAME
    // operator at two reference scales — differential-test them equal
    // on random corpora (cuts, counters and cleaned text all match)
    val rnd = new scala.util.Random(1234)
    (1 to 3).foreach { trial =>
      val mk = (id: Long, n: Int) =>
        (id, (0 until n).map(_ => "t" + rnd.nextInt(4)).mkString(" "))
      val corpusDf = (0 until 12).map(i => mk(i.toLong, 6 + rnd.nextInt(14)))
        .toDF("post_key", "body")
      val refDf = (100 until 104).map(i => mk(i.toLong, 6 + rnd.nextInt(14)))
        .toDF("post_key", "body")
      val n = 4
      val viaBroadcast = Pipeline.decontaminateSpans(
          corpusDf, refDf, textCol = "body", n = n)
        .select(col("post_key").as("doc_id"), col("cut_spans"),
          col("text_clean"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      val viaJoin = Pipeline.decontaminateSpansAgainstCorpus(
          corpusDf, refDf, "post_key", "body", n = n)
        .select(col("doc_id"), col("cut_spans"), col("text_clean"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      assert(viaBroadcast == viaJoin, s"trial $trial strategies diverge")
      // the fixture vocabulary is tiny enough that some trial cuts
      assert(viaJoin.nonEmpty)
    }
  }

  test("decontaminateSpans: n-gram straddling a cut seam cannot survive re-probe") {
    import spark.implicits._
    // excising [p, p+n) windows can create NEW adjacencies at seams;
    // the guarantee is that no EVAL n-gram survives in the kept
    // segments — re-probing the cleaned text per segment finds nothing
    val rnd = new scala.util.Random(77)
    val docs = (0 until 8).map { i =>
      val n = 6 + rnd.nextInt(15)
      (i.toLong,
        (0 until n).map(_ => "s" + rnd.nextInt(3)).mkString(" "))
    }
    val corpusDf = docs.toDF("post_key", "body")
    val evalDf = docs.take(2).toDF("post_key", "body")
    val n = 4
    val out = Pipeline.decontaminateSpans(corpusDf, evalDf, "body", n = n)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[String]("cut_spans"))).sortBy(_._1)
    val evalGrams = docs.take(2).flatMap(_._2.split(" ").sliding(n)
      .filter(_.length == n).map(_.mkString(" "))).toSet
    out.foreach { case (id, body, spans) =>
      val ws = docs.find(_._1 == id).get._2.split(" ")
      val cuts =
        if (spans.isEmpty) Seq.empty[(Int, Int)]
        else spans.split(",").toSeq.map { s =>
          val Array(x, y) = s.split("-"); (x.toInt, y.toInt) }
      val keptRuns = ((0 +: cuts.map(_._2)) zip (cuts.map(_._1) :+ ws.length))
        .filter(r => r._1 < r._2)
      keptRuns.foreach { r =>
        ws.slice(r._1, r._2).sliding(n).filter(_.length == n).foreach { g =>
          assert(!evalGrams.contains(g.mkString(" ")),
            s"doc $id: eval gram '${g.mkString(" ")}' survived")
        }
      }
    }
  }

  test("dedup reports: hottest lines and grams, bytes accounting; alien columns") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta\ncookie banner\nunique one"),
      (2L, "gamma delta\ncookie banner\n  \nunique two"),
      (3L, "cookie banner\nalpha beta"),
      (4L, "solo line")).toDF("post_key", "body")
    val rep = Pipeline.dedupParagraphsReport(docs, "post_key", "body", k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // the banner is hottest (3 copies over 3 docs), the shared opener
    // follows; the whitespace-only line is structure, never reported
    assert(rep == Seq(
      (1, "cookie banner", 3L, 3L, 2L * "cookie banner".length),
      (2, "alpha beta", 2L, 2L, 1L * "alpha beta".length)))
    // substring layer over the main fixture: B repeats 41 of A's
    // 10-gram windows, F repeats all 51 of E's, D quotes one of C's —
    // every duplicated gram sits in exactly 2 docs
    val sub = Pipeline.dedupSubstringsReport(corpus, "post_key", "body",
        minLen = 10, k = 100)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(sub.length == 41 + 51 + 1)
    assert(sub.forall(_._3 == 2L))
    // gram text comes from each winner's FIRST occurrence
    assert(sub.exists(_._2 == (21 to 30).map(i => s"v$i").mkString(" ")))
    assert(sub.exists(_._2 == (1 to 10).map(i => s"w$i").mkString(" ")))
    assert(sub.exists(_._2 == (1 to 10).map(i => s"x$i").mkString(" ")))
    assert(sub.forall(g => g._4 == g._2.getBytes("UTF-8").length.toLong))
    // rk is dense 1..n; ties break on the rolling hash, so ordering is
    // deterministic but not lexicographic; every row is a distinct run
    assert(sub.map(_._1) == (1 to sub.length))
    assert(sub.map(_._2).distinct.size == sub.length)
  }

  test("chunkText respectSentences: ends snap to sentence boundaries in-window") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // '.' and the multi-byte '”' both exercise the terminal test;
    // doc 0 is empty (the one-empty-chunk floor)
    val docs = (0 until 12).map { i =>
      val n = if (i == 0) 0 else 1 + rnd.nextInt(40)
      (i.toLong, (0 until n).map { _ =>
        val w = "w" + rnd.nextInt(50)
        rnd.nextInt(8) match {
          case 0 => w + "."
          case 1 => w + "”"
          case _ => w
        }
      }.mkString(" "))
    }
    val cw = 8
    val ov = 2
    def isEnd(w: String): Boolean =
      w.endsWith(".") || w.endsWith("!") || w.endsWith("?") ||
        w.endsWith("\"") || w.endsWith("”")
    val frame = Pipeline.chunkText(
      (docs :+ ((99L, null.asInstanceOf[String]))).toDF("post_key", "body"),
      "post_key", "body", chunkWords = cw, overlapWords = ov,
      respectSentences = true)
    // a NULL-text doc must not VANISH: one chunk, NULL text/offsets —
    // the fixed-window path's shape
    val nullRows = frame.filter(col("doc_id") === 99L).collect()
    assert(nullRows.length == 1)
    assert(nullRows(0).getInt(1) == 0 &&
      nullRows(0).isNullAt(4) && nullRows(0).isNullAt(5) &&
      nullRows(0).isNullAt(6))
    val out = frame.filter(col("doc_id") =!= 99L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getString(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6)))
    docs.foreach { case (id, text) =>
      val ws = text.split("\\s+").filter(_.nonEmpty)
      val chunks = out.filter(_._1 == id).sortBy(_._2)
      assert(chunks.nonEmpty, s"doc $id emitted no chunks")
      if (ws.isEmpty) {
        assert(chunks.length == 1 && chunks(0)._4 == 0 &&
          chunks(0)._5 == "" && chunks(0)._6 == -1L)
      } else {
        chunks.zipWithIndex.foreach {
          case ((_, _, s, ncw, ctext, sc, ec), k) =>
            val e = s + ncw
            assert(ncw >= 1 && e <= ws.length)
            // THE boundary property: a non-final chunk ends at the
            // LAST sentence boundary in its full window, or at the
            // fixed window end when none exists
            if (k < chunks.length - 1) {
              val window = (s.toInt until (s.toInt + cw))
              val ends = window.filter(j => isEnd(ws(j)))
              if (ends.nonEmpty) assert(e == ends.max + 1,
                s"doc $id chunk $k: end $e vs last boundary ${ends.max + 1}")
              else assert(e == s + cw)
            } else assert(e == ws.length && ws.length - s <= cw)
            // chunk text + citation span recover the same words
            assert(ctext == ws.slice(s.toInt, e.toInt).mkString(" "))
            val cited = text.substring(sc.toInt - 1, ec.toInt)
            assert(cited.split("\\s+").filter(_.nonEmpty).toSeq ==
              ws.slice(s.toInt, e.toInt).toSeq, s"doc $id chunk $k citation")
        }
        // layout: starts advance as max(s+1, e-overlap); full coverage
        chunks.sliding(2).foreach {
          case Array((_, _, s1, n1, _, _, _), (_, _, s2, _, _, _, _)) =>
            assert(s2 == math.max(s1 + 1, s1 + n1 - ov))
          case _ => ()
        }
        assert(chunks.head._3 == 0 && chunks.map(c => c._3 + c._4).max
          == ws.length)
      }
    }
  }

  test("resampleByImportance: deterministic Gumbel draw; temperature limits") {
    import spark.implicits._
    val scored = (1 to 100).map(i => (i.toLong, i / 10.0)).toDF("doc_id", "s")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val sel = Pipeline.resampleByImportance(scored, "doc_id", "s", k = 10)
    assert(sel.count() == 10)
    assert(sel.columns.contains("gumbel_key"))
    // RNG-free: the same inputs select the same documents, every run
    assert(ids(sel) ==
      ids(Pipeline.resampleByImportance(scored, "doc_id", "s", k = 10)))
    // T -> 0: score dominates the key — exactly the top k by score
    assert(ids(Pipeline.resampleByImportance(
      scored, "doc_id", "s", k = 10, temperature = 1e-9)) ==
      (91L to 100L).toSet)
    // T -> inf: score is irrelevant — identical draw to constant scores
    val flat = scored.withColumn("s", lit(0.0))
    assert(ids(Pipeline.resampleByImportance(
      scored, "doc_id", "s", k = 10, temperature = 1e12)) ==
      ids(Pipeline.resampleByImportance(flat, "doc_id", "s", k = 10)))
    // at T = 1 the draw is score-TILTED but not score-sorted: high
    // scorers are favored, yet at least one sub-top-10 doc makes it in
    val t1 = ids(Pipeline.resampleByImportance(scored, "doc_id", "s", k = 10))
    assert(t1.exists(_ <= 90L) && t1.count(_ > 50L) > 5)
    // k >= n keeps everything
    assert(Pipeline.resampleByImportance(scored, "doc_id", "s", k = 200)
      .count() == 100)
  }

  test("c4CleanLines: each C4 rule fires; page verdicts; alien columns") {
    import spark.implicits._
    val good = "This is a perfectly reasonable sentence of prose."
    val pages = Seq(
      // kept page: three punctuated >=5-word lines survive
      (1L, s"$good\n$good\nAnother fine sentence closes the page!"),
      // line rules: no terminal punct / too few words / javascript ban
      (2L, s"$good\nthis line has no terminal punctuation\nToo few words.\n" +
        s"Please enable javascript to view this content.\n$good\n$good"),
      // page bans: lorem ipsum; curly brace (code leak)
      (3L, s"$good\n$good\nLorem Ipsum dolor sit amet for padding."),
      (4L, s"$good\n$good\nfunction f() { return 1; } is leaked code."),
      // too few sentences after cleaning
      (5L, s"$good\nno punct here so it drops"))
      .toDF("page_id", "content")
    val got = operators.Pipeline.c4CleanLines(pages, "page_id", "content")
      .collect().map(r => r.getLong(0) -> (
        r.getLong(r.fieldIndex("n_lines")),
        r.getLong(r.fieldIndex("n_kept_lines")),
        r.getLong(r.fieldIndex("n_sentences")),
        r.getBoolean(r.fieldIndex("keep")),
        r.getString(r.fieldIndex("cleaned_text")))).toMap
    assert(got(1L) == (3L, 3L, 3L, true,
      s"$good\n$good\nAnother fine sentence closes the page!"))
    // page 2: of 6 lines, the unpunctuated, the short, and the
    // javascript line drop — 3 survive, page keeps
    assert(got(2L)._1 == 6L && got(2L)._2 == 3L && got(2L)._4 == true)
    assert(!got(2L)._5.toLowerCase.contains("javascript"))
    // lorem ipsum and '{' reject the PAGE even with enough sentences
    assert(got(3L)._3 >= 3L && got(3L)._4 == false)
    assert(got(4L)._4 == false)
    // a cleaned page below minSentences is rejected
    assert(got(5L) == (2L, 1L, 1L, false, good))
    // thresholds and ban lists are caller policy
    val strict = operators.Pipeline.c4CleanLines(pages, "page_id", "content",
      minLineWords = 9, minSentences = 1, pageBanned = Seq("reasonable"))
      .collect().map(r => r.getLong(0) ->
        r.getBoolean(r.fieldIndex("keep"))).toMap
    assert(strict(1L) == false) // 'reasonable' now page-banned
    // caller columns + order preserved, signals appended
    assert(operators.Pipeline.c4CleanLines(pages, "page_id", "content")
      .columns.toSeq == Seq("page_id", "content", "cleaned_text",
        "n_lines", "n_kept_lines", "n_sentences", "keep"))
    // a NULL page gets keep = FALSE, never NULL (the gopher
    // NULL-verdict lesson — review r11); signal columns stay NULL
    val nullPage = operators.Pipeline.c4CleanLines(
      Seq((9L, Option.empty[String])).toDF("page_id", "content"),
      "page_id", "content").collect()(0)
    val keepIdx = nullPage.fieldIndex("keep")
    assert(!nullPage.isNullAt(keepIdx) && !nullPage.getBoolean(keepIdx))
  }

  test("ngramDecontaminate flags docs sharing an n-gram with the eval set; alien columns") {
    import spark.implicits._
    // eval suite = doc 10; doc 11 is its one-word edit, so long runs of
    // 13 consecutive words survive the edit and 11 is contaminated;
    // 12–15 share no 13-gram with 10
    val evalSet = corpus.filter(col("post_key") === 10L)
    val train = corpus.filter(col("post_key") =!= 10L)
    val got = Pipeline.ngramDecontaminate(train, evalSet, textCol = "body")
    // all caller columns survive, flag appended
    assert(got.columns.toSeq == Seq("post_key", "body", "contaminated"))
    val flags = got.collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("contaminated"))).toMap
    assert(flags == Map(11L -> true, 12L -> false, 13L -> false,
      14L -> false, 15L -> false))
    // smaller n: doc 13 embeds a 10-word passage of doc 12 → 8-grams
    // inside the passage hit; the passage carries no 13-gram, so the
    // default n leaves 13 clean (asserted above)
    val got8 = Pipeline.ngramDecontaminate(
      train.filter(!col("post_key").isin(11L, 12L)),
      corpus.filter(col("post_key") === 12L), textCol = "body", n = 8)
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("contaminated"))).toMap
    assert(got8 == Map(13L -> true, 14L -> false, 15L -> false))
    // eval side with a DIFFERENT text column name; custom flag name
    val alienEval = evalSet.toDF("k", "contents")
    val gotAlien = Pipeline.ngramDecontaminate(train, alienEval,
      textCol = "body", evalTextCol = "contents", flagCol = "dirty")
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("dirty"))).toMap
    assert(gotAlien == flags)
    // docs shorter than n words carry no n-gram and are never flagged;
    // an empty eval set flags nothing
    val shorts = Seq((1L, "only five words right here"), (2L, mk((1 to 60).map(i => s"w$i"))))
      .toDF("post_key", "body")
    val gotShort = Pipeline.ngramDecontaminate(shorts, evalSet, textCol = "body")
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("contaminated"))).toMap
    assert(gotShort == Map(1L -> false, 2L -> true)) // doc 2 IS doc 10's text
    val emptyEval = Pipeline.ngramDecontaminate(
      train, evalSet.filter(col("post_key") === -1L), textCol = "body")
      .collect().map(_.getBoolean(2))
    assert(emptyEval.forall(_ == false))
    // a NULL text is NOT contaminated — and the flag must be FALSE,
    // not NULL, or the doc escapes both filter(flag) and filter(!flag)
    // (review r11)
    val withNull = Seq((50L, Option.empty[String])).toDF("post_key", "body")
    val nullRow = Pipeline.ngramDecontaminate(withNull, evalSet, textCol = "body")
      .collect()(0)
    assert(!nullRow.isNullAt(2) && !nullRow.getBoolean(2))
    // cross-operator consistency: the hash-membership flag agrees with
    // the explode-join COUNT operator at the same n — a doc is flagged
    // iff sharedKgramCounts reports >= 1 shared distinct n-gram for it
    // (randomized corpora; two independent code paths, one contract)
    val rnd = new scala.util.Random(29)
    val vocab = Vector("sun", "moon", "tide", "rock", "fern", "mist")
    val randDocs = (0L until 40L).map { i =>
      (i, (0 until 4 + rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("post_key", "body")
    val ev = randDocs.filter(col("post_key") % 7 === 0)
    val tr = randDocs.filter(col("post_key") % 7 =!= 0)
    val flagged = Pipeline.ngramDecontaminate(tr, ev, "body", n = 4)
      .filter(col("contaminated")).select("post_key").collect()
      .map(_.getLong(0)).toSet
    val counted = Pipeline.sharedKgramCounts(tr, ev, "post_key", "body", k = 4)
      .select("train_doc").collect().map(_.getLong(0)).toSet
    assert(flagged == counted,
      s"membership flag and count operator disagree: $flagged vs $counted")
  }

  test("collapseNeardups keeps min-id representatives and all caller columns") {
    val pairs = Pipeline.minhashNeardupPairs(corpus, "post_key", "body")
      .select(col("doc_a"), col("doc_b"))
    val kept = Pipeline.collapseNeardups(
      corpus.withColumn("extra", col("post_key") * 2), "post_key", pairs)
    assert(kept.columns.toSeq == Seq("post_key", "body", "extra"))
    // 11 collapses into representative 10, 15 into 14; 12/13 unpaired
    assert(kept.select("post_key").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 12L, 13L, 14L))
  }

  test("sharedKgramCounts flags the copied passage between C and D") {
    val shared = Pipeline.sharedKgramCounts(
      train = corpus.filter(col("post_key") === 13L),
      evalSet = corpus.filter(col("post_key") === 12L),
      idCol = "post_key", textCol = "body", k = 5)
      .collect()
    // the copied block v21..v30 contributes its distinct 5-grams:
    // positions 51..56 of doc D = 6 grams fully inside the copied block
    assert(shared.length == 1)
    val r = shared(0)
    assert(r.getLong(r.fieldIndex("train_doc")) == 13L)
    assert(r.getLong(r.fieldIndex("eval_doc")) == 12L)
    assert(r.getLong(r.fieldIndex("n_shared_5grams")) == 6L)
  }

  test("exactDedup keeps the min-id row per content and all caller columns") {
    import spark.implicits._
    val df = Seq((5L, "same text", "a"), (3L, "same text", "b"),
      (7L, "other", "c")).toDF("post_key", "body", "tag")
    val kept = Pipeline.exactDedup(df, "post_key", "body")
    assert(kept.columns.toSeq == Seq("post_key", "body", "tag"))
    assert(kept.collect().map(r => (r.getLong(0), r.getString(2))).sorted.toSeq ==
      Seq((3L, "b"), (7L, "c")))
  }

  test("winnowFingerprintSet/winnowNeardupCandidates: the coverage guarantee " +
      "(shared ≥ w+k−1 run ⇒ shared fingerprint), short docs drop, " +
      "distinct texts don't pair") {
    import spark.implicits._
    val sharedRun = "alpha beta gamma delta epsilon zeta" // 6 = w + k − 1
    val docs = Seq(
      (1L, s"one two three $sharedRun four five six"),
      (2L, s"seven eight $sharedRun nine ten eleven twelve"),
      (3L, "totally different words with nothing in common here at all"),
      (4L, "short doc here")) // < k + w − 1 = 6 words → no fingerprints
      .toDF("post_key", "body")
    val fps = Pipeline.winnowFingerprintSet(docs, "post_key", "body")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps.keySet == Set(1L, 2L, 3L)) // short doc carries no row
    // the winnowing theorem: a shared 6-word run MUST contribute at
    // least one shared selected fingerprint
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert((fps(1L) & fps(3L)).isEmpty)
    // density: far fewer fingerprints than grams (the 2/(w+1) point)
    assert(fps(1L).size < 10)
    val pairs = Pipeline.winnowNeardupCandidates(docs, "post_key", "body",
      minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    intercept[IllegalArgumentException](
      Pipeline.winnowNeardupCandidates(docs, "post_key", "body",
        minShared = 0))
  }

  test("softDedupWeights: 1/n_copies per exact-content group; NULL text " +
      "stays weight 1; each distinct content's total mass is 1") {
    import spark.implicits._
    val df = Seq((1L, "same"), (2L, "same"), (3L, "same"), (4L, "other"),
      (5L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String]))
      .toDF("post_key", "body")
    val w = Pipeline.softDedupWeights(df, "post_key", "body")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(w(1L) == ((3L, 1.0 / 3)) && w(2L) == w(1L) && w(3L) == w(1L))
    assert(w(4L) == ((1L, 1.0)))
    // NULL text rows are each their own group — never merged
    assert(w(5L) == ((1L, 1.0)) && w(6L) == ((1L, 1.0)))
    // every distinct non-null content sums to exactly 1.0 of mass
    assert(w.values.filter(_._1 == 3L).map(_._2).sum == 1.0)
    // all caller columns survive, nothing dropped
    assert(Pipeline.softDedupWeights(df, "post_key", "body").count() == 6L)
  }

  test("dedupBagOfWords: permuted copies collapse (where exactDedup keeps both), " +
      "multiset not set, NULL-text rows all kept, whitespace normalizes") {
    import spark.implicits._
    val df = Seq(
      (1L, "big data is fast", "a"),      // original
      (2L, "fast is big data", "b"),      // permutation → dropped
      (3L, "big  data is   fast", "c"),   // whitespace runs → dropped
      (4L, "big data fast", "d"),         // missing a word → kept
      (5L, "big big data is fast", "e"),  // extra duplicate word → kept
      (6L, null.asInstanceOf[String], "f"),
      (7L, null.asInstanceOf[String], "g"))
      .toDF("post_key", "body", "tag")
    val kept = Pipeline.dedupBagOfWords(df, "post_key", "body")
    assert(kept.columns.toSeq == Seq("post_key", "body", "tag"))
    assert(kept.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 4L, 5L, 6L, 7L))
    // the byte-level layer provably misses the permutation
    assert(Pipeline.exactDedup(df, "post_key", "body").count() == 7L)
  }

  test("exactDedup keeps every NULL-text row; admit/rebalance guard their inputs") {
    import spark.implicits._
    // NULL text never matches anything — md5(NULL) is NULL and the
    // dedup window groups NULLs, which would silently collapse distinct
    // ingest-failure rows; admitAgainstCorpus already treats a NULL
    // content hash as never-matching, so the batch operator must too
    val df = Seq((1L, Some("same"), "a"), (2L, Some("same"), "b"),
      (3L, None, "c"), (4L, None, "d"), (5L, None, "e"))
      .toDF("post_key", "body", "tag")
    val kept = Pipeline.exactDedup(df, "post_key", "body")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 5L)) // dup collapsed, ALL null-text kept
    // admitAgainstCorpus fails fast when incoming already carries its
    // output columns (duplicate names would poison downstream col())
    val clash = Seq((1L, "x")).toDF("post_key", "body")
      .withColumn("content_hash", lit("h"))
    val e = intercept[IllegalArgumentException](
      Pipeline.admitAgainstCorpus(df, clash, "post_key", "body"))
    assert(e.getMessage.contains("content_hash"))
    // …and its own output re-admits cleanly once those are dropped
    val corpus = Seq((1L, "alpha")).toDF("post_key", "body")
    val once = Pipeline.admitAgainstCorpus(corpus,
      Seq((2L, "beta")).toDF("post_key", "body"), "post_key", "body")
    val again = Pipeline.admitAgainstCorpus(corpus,
      once.drop("content_hash", "band_sig"), "post_key", "body")
    assert(again.select("post_key").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // rebalanceToMix rejects duplicate stratum keys and non-positive
    // weights instead of silently duplicating corpus rows via the join
    val strat = Seq((1L, "en"), (2L, "de")).toDF("post_key", "stratum")
    val dup = intercept[IllegalArgumentException](
      Pipeline.rebalanceToMix(strat, "post_key", "stratum",
        Seq("en" -> 4L, "en" -> 1L)))
    assert(dup.getMessage.contains("duplicate"))
    intercept[IllegalArgumentException](
      Pipeline.rebalanceToMix(strat, "post_key", "stratum", Seq("en" -> 0L)))
    intercept[IllegalArgumentException](
      Pipeline.rebalanceToMix(strat, "post_key", "stratum", Nil))
  }

  test("admitAgainstCorpus drops exact and near-dup re-posts, admits fresh docs") {
    import spark.implicits._
    val aWords = (1 to 60).map(i => s"w$i")
    val a = mk(aWords)
    // a 1-word edit only keeps the band-0 signature when none of the 5
    // broken shingles held a band minimum — pick the first position
    // that does (one must: 12 edit sites cover 60 shingle slots and
    // only 4 minima exist), so the test never depends on hash luck
    def sigOf(text: String): String = {
      import spark.implicits._
      Seq(text).toDF("body").select(graft.operators.Pipeline.bandSignature(
        graft.operators.Pipeline.shingleHashes(split(col("body"), "\\s+"))))
        .collect()(0).getString(0)
    }
    val aEdit = (0 until 60 by 5).iterator
      .map(p => mk(aWords.updated(p, "edited")))
      .find(t => sigOf(t) == sigOf(a))
      .getOrElse(fail("no signature-preserving edit position found"))
    val fresh = mk((1 to 60).map(i => s"z$i"))
    val corpus = Seq((1L, a), (2L, "tiny")).toDF("post_key", "body")
    val incoming = Seq(
      (10L, a),      // exact dup → dropped
      (11L, aEdit),  // near-dup (same band-0 signature) → dropped
      (12L, fresh),  // new content → admitted
      (13L, "tiny"), // exact short dup → dropped
      (14L, "tiny2") // new short doc (sig NULL) → admitted
    ).toDF("post_key", "body")
    val admitted = Pipeline.admitAgainstCorpus(corpus, incoming,
      "post_key", "body")
    assert(admitted.select("post_key").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(12L, 14L))
    assert(admitted.columns.take(2).toSeq == Seq("post_key", "body"))
  }

  test("langIdPredict votes markers with deterministic ties; und on none") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat of the house is here"),     // en markers
      (2L, "der hund und die katze ist da"),    // de markers
      (3L, "xyzzy plugh quux"),                 // no markers → und
      (4L, "the le")                            // 1 en vs 1 fr: en wins tie
    ).toDF("post_key", "body")
    val out = Pipeline.langIdPredict(df, "body")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "und", 4L -> "en"))
  }

  test("qualityScore composes the four signals; keep honors the threshold") {
    import spark.implicits._
    val good = ("the quality of and is " * 20).trim   // long, stopwordy, no punct
    val bad = "!!! ??? ;;;"
    val df = Seq((1L, good), (2L, bad)).toDF("post_key", "body")
    val out = Pipeline.qualityScore(df, "body")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(r.fieldIndex("quality")), r.getBoolean(r.fieldIndex("keep"))))
      .toMap
    assert(out(1L)._1 > out(2L)._1 && out(1L)._2 && !out(2L)._2)
  }

  test("winnowFingerprints: identical texts share a fingerprint, others differ") {
    import spark.implicits._
    val a = mk((1 to 30).map(i => s"w$i"))
    val df = Seq((1L, a), (2L, a), (3L, mk((1 to 30).map(i => s"v$i"))))
      .toDF("post_key", "body")
    val fps = Pipeline.winnowFingerprints(df, "post_key", "body")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L) && fps(1L) != fps(3L))
  }

  test("clusterRepresentatives keeps the highest-score bucket member") {
    import spark.implicits._
    val a = mk((1 to 60).map(i => s"w$i"))
    val other = mk((1 to 60).map(i => s"v$i"))
    // two exact copies (same bucket trivially) with different scores,
    // plus a singleton that must NOT be reported
    val df = Seq((1L, a, 10L), (2L, a, 99L), (3L, other, 5L))
      .toDF("post_key", "body", "quality")
    val reps = Pipeline.clusterRepresentatives(df, "post_key", "body",
      score = col("quality")).collect()
    assert(reps.length == 1)
    assert(reps(0).getLong(reps(0).fieldIndex("keep_id")) == 2L)
    assert(reps(0).getLong(reps(0).fieldIndex("n_members")) == 2L)
  }

  test("hashSample is a deterministic pure function of the id") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("post_key", "grp")
    val pct = when(col("grp") === "a", 25).otherwise(75)
    val s1 = Pipeline.hashSample(df, "post_key", pct)
      .select("post_key").collect().map(_.getLong(0)).sorted.toSeq
    val s2 = Pipeline.hashSample(df, "post_key", pct)
      .select("post_key").collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2 && s1.nonEmpty && s1.size < 400)
    // strata draw at visibly different rates on 200 rows each
    val byGrp = s1.groupBy(_ % 2 == 0).view.mapValues(_.size).toMap
    assert(byGrp(false) > byGrp(true)) // 75% of "b" > 25% of "a"
  }

  test("rebalanceToMix honors the target mix; a missing stratum empties it") {
    import spark.implicits._
    val df = ((1L to 300L).map(i => (i, "en")) ++ (301L to 400L).map(i => (i, "de")))
      .toDF("post_key", "stratum")
    val out = Pipeline.rebalanceToMix(df, "post_key", "stratum",
      weights = Seq("en" -> 3L, "de" -> 1L))
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // T = min(floor(300·4/3), floor(100·4/1)) = 400 → en 300, de 100
    assert(out == Map("en" -> 300L, "de" -> 100L))
    val empty = Pipeline.rebalanceToMix(df, "post_key", "stratum",
      weights = Seq("en" -> 3L, "de" -> 1L, "zz" -> 1L))
    assert(empty.count() == 0) // absent target stratum drives T to 0
  }

  test("centroidOutliers flags the farthest vector per label") {
    import spark.implicits._
    val df = Seq(
      (1L, 5, Array(0.0f, 0.0f)), (2L, 5, Array(0.1f, 0.0f)),
      (3L, 5, Array(8.0f, 8.0f)), // the outlier in label 5
      (4L, 6, Array(1.0f, 1.0f)), (5L, 6, Array(1.1f, 1.0f)))
      .toDF("pk", "lab", "vec")
    val top = Pipeline.centroidOutliers(df, "pk", "vec", "lab",
      topK = 1, dim = 2).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(top(5) == 3L)
  }

  test("tokenCounts / vocabTopK / sourceMixingWeights on alien schemas") {
    import spark.implicits._
    val df = Seq(
      (1L, "srcA", "ab12 cd!"),
      (2L, "srcA", "x y"),
      (3L, "srcB", "x x x"))
      .toDF("post_key", "origin", "body")
    val tc = Pipeline.tokenCounts(df, "body").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("ws_tokens")), r.getLong(r.fieldIndex("bpe_tokens"))))
      .toMap
    assert(tc(1L) == (2L, 4L)) // ws: [ab12][cd!]; bpe: [ab][12][cd][!]
    val vocab = Pipeline.vocabTopK(df, "post_key", "body", k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(vocab.head == ("x", 4L, 2L)) // tf 4 across docs 2 and 3
    val mix = Pipeline.sourceMixingWeights(df, "origin",
      size(split(col("body"), "\\s+")).cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("tokens"))).toMap
    assert(mix == Map("srcA" -> 4L, "srcB" -> 3L)) // srcA: 2 ("ab12 cd!") + 2 ("x y")
  }

  test("PiiScrub: overlaps counted once, whole tokens consumed (no stray digits)") {
    import spark.implicits._
    import graft.operators.PiiScrub
    val df = Seq(
      (1L, "reach +1-555-1234@mail.example.com now"), // phone-shaped email local part
      (2L, "srv 10.0.42.12 down, call +1-555-12345")) // longer ip/digit runs
      .toDF("id", "text")
    val out = df.select(col("id"),
        PiiScrub.redact(col("text")).as("r"),
        PiiScrub.counts(col("text")).reduce(_ + _).as("n_pii"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // one redaction, one count — NOT email + phone double-counted
    assert(out(1L) == ("reach <EMAIL> now", 1L))
    // patterns consume the whole token: no '<IP>2' / '<PHONE>5' leftovers
    assert(out(2L) == ("srv <IP> down, call <PHONE>", 2L))
  }

  test("PiiScrub: production pack redacts general shapes; packs are caller-supplied") {
    import spark.implicits._
    import graft.operators.PiiScrub
    val df = Seq(
      (1L, "card 4111-1111-1111-1111 and ssn 078-05-1120"),
      (2L, "call (212) 555-0187 or +44 20 7946 0958"),
      (3L, "host 192.168.7.19, id 123456789012345678901 stays"), // 21 digits: NOT a card
      (4L, "mail a.b+c@sub.example.org, raw 4111111111111111"))
      .toDF("id", "text")
    val out = df.select(col("id"),
        PiiScrub.redact(col("text"), PiiScrub.DefaultPatterns).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "card <CARD> and ssn <SSN>")
    assert(out(2L) == "call <PHONE> or <PHONE>")
    // extension-suffixed numbers redact WITH the extension consumed: a
    // bare \b after the digits would fail at the digit/'x' boundary
    // and leak the entire number (the code-review r10 regression)
    val ext = Seq((10L, "call (212) 555-0187x42 or 555-123-4567x9 or +44 20 7946 0958x123"))
      .toDF("id", "text")
      .select(PiiScrub.redact(col("text"), PiiScrub.DefaultPatterns))
      .collect()(0).getString(0)
    assert(ext == "call <PHONE> or <PHONE> or <PHONE>")
    // extensions of ANY length: a bounded x-quantifier couldn't consume
    // a 7+-digit extension, the trailing \b then failed mid-run, and
    // the ENTIRE number leaked unredacted (ADVICE r10)
    val longExt = Seq((11L, "dial 555-123-4567x1234567 or (212) 555-0187x99999999999"))
      .toDF("id", "text")
      .select(PiiScrub.redact(col("text"), PiiScrub.DefaultPatterns))
      .collect()(0).getString(0)
    assert(longExt == "dial <PHONE> or <PHONE>")
    // word-bounded: the 21-digit id must NOT lose 16 digits to the card pass
    assert(out(3L) == "host <IP>, id 123456789012345678901 stays")
    assert(out(4L) == "mail <EMAIL>, raw <CARD>")
    // counts columns follow the pack's names and sum to the redactions
    val c = df.filter(col("id") === 1L)
      .select(PiiScrub.counts(col("text"), PiiScrub.DefaultPatterns): _*)
      .collect()(0)
    assert(c.schema.fieldNames.toSeq ==
      Seq("n_emails", "n_cards", "n_ssns", "n_ips", "n_phones"))
    assert((0 until 5).map(c.getLong).sum == 2L)
  }

  test("PiiScrub: production pack precision corpus — non-PII shapes survive unredacted") {
    import spark.implicits._
    import graft.operators.PiiScrub
    // Regression fence for DefaultPatterns edits: every row here pins
    // PRECISION (what must NOT be redacted), the complement of the
    // recall cases above. A pack change that starts firing on any of
    // these shapes is a behavior change, not a refactor.
    val keep = Seq(
      "+12345678901234567890",   // '+' + 20-digit run: too long for card,
                                 // phone must not consume a prefix (\b)
      "id 123456789012345678901",// bare 21-digit run (card is 13-19, word-bounded)
      "v1.2.3 released",         // 3-component version: not IPv4-shaped
      "isbn 978-0-306-40615-7",  // ISBN-13: no 3-2-4 / 3-3-4 digit grouping
      "build 2024.01.15",        // 2-dot date-ish: not IPv4-shaped
      "+1 2",                    // too few digits for any phone alternative
      "order 12-34-5678")        // 2-2-4 grouping: not SSN's 3-2-4
    val out = keep.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        PiiScrub.redact(col("text"), PiiScrub.DefaultPatterns).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    keep.zipWithIndex.foreach { case (t, i) =>
      assert(out(i.toLong) == t, s"precision corpus row $i was altered") }
    // Known, documented limit (no lookaround in the portable subset):
    // a 4-component dotted quad is shape-identical to IPv4, so the
    // leading quad of a 5-component run IS redacted — pinned here so
    // the limitation is a conscious contract, not a surprise.
    val quad = Seq((0L, "chain 1.2.3.4.5")).toDF("id", "text")
      .select(PiiScrub.redact(col("text"), PiiScrub.DefaultPatterns).as("r"))
      .collect()(0).getString(0)
    assert(quad == "chain <IP>.5")
  }

  test("leakageSafeSplit: near-dup pairs never straddle splits, all rows assigned") {
    val pairs = Pipeline.minhashNeardupPairs(corpus, "post_key", "body")
      .select(col("doc_a"), col("doc_b"))
    val assigned = Pipeline.leakageSafeSplit(corpus, "post_key", pairs)
    val rows = assigned.collect()
      .map(r => r.getLong(r.fieldIndex("post_key")) ->
        (r.getLong(r.fieldIndex("component")),
          r.getString(r.fieldIndex("split")))).toMap
    assert(rows.size == 6) // every caller row assigned, columns preserved
    assert(rows.values.map(_._2).forall(Set("train", "val", "test")))
    // the near-dup pair (10,11) and exact-dup pair (14,15) share
    // component AND split — the leakage guarantee
    assert(rows(10L) == rows(11L) && rows(14L) == rows(15L))
    // unpaired docs are their own component
    assert(rows(12L)._1 == 12L && rows(13L)._1 == 13L)
  }

  test("one connectedComponents pass feeds collapse, split and report identically") {
    // the shared-graph contract: a pipeline shipping all three dedup
    // consumers runs the expensive pair graph + CC ONCE and fans out —
    // each ByComponents result must equal its recompute-from-pairs twin
    val pairs = Pipeline.minhashNeardupPairs(corpus, "post_key", "body")
      .select(col("doc_a"), col("doc_b"))
    val comp = Pipeline.connectedComponents(pairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // sorted Seq, not toSet: a duplicate-row regression (e.g. joining
      // a non-distinct component table) must FAIL, not vanish in the set
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
      assert(rows(Pipeline.collapseByComponents(corpus, "post_key", comp)) ==
        rows(Pipeline.collapseNeardups(corpus, "post_key", pairs)))
      assert(rows(Pipeline.splitByComponents(corpus, "post_key", comp)) ==
        rows(Pipeline.leakageSafeSplit(corpus, "post_key", pairs)))
      assert(rows(Pipeline.dedupReport(comp)) ==
        // {10,11} and {14,15}: two 2-components → one histogram row
        Seq(Seq("2", "2", "4", "2")))
    } finally comp.unpersist()
  }

  test("ngramJaccardPairs: exact dup found, unrelated not, group blocking holds") {
    import spark.implicits._
    val df = Seq(
      (1L, "g1", "hello world hello again"),
      (2L, "g1", "hello world hello again"), // exact dup of 1
      (3L, "g1", "zzzz qqqq totally different"),
      (4L, "g2", "hello world hello again")) // dup of 1 in ANOTHER group
      .toDF("post_key", "grp", "body")
    val blocked = Pipeline.ngramJaccardPairs(df, "post_key", "body",
      groupCols = Seq("grp")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // only the same-group exact dup pairs; jaccard of identical sets = 1
    assert(blocked == Seq((1L, 2L, 1.0)))
    val unblocked = Pipeline.ngramJaccardPairs(df, "post_key", "body")
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(unblocked == Seq((1L, 2L, 1.0), (1L, 4L, 1.0), (2L, 4L, 1.0)))
    spark.catalog.clearCache() // release the operator's internal persist
  }

  test("ngramJaccardPairs: dictionary broadcast advisory fails fast and " +
      "actionably (r20 guard); defaults never fire at sane scale") {
    import spark.implicits._
    // ~500 distinct trigrams across two docs: with the advisory forced
    // to 1 row per hash bucket, at least one of the 4096 buckets holds
    // >= 2 grams (P[all singleton] ~ e^-30 on a FIXED corpus — the
    // hash is deterministic, so this either always fires or never
    // does; it fires) and the guard must raise with the actionable
    // message instead of proceeding to the forced broadcast
    val txt1 = (1 to 260).map(i => ('a' + i % 26).toChar).mkString ++
      (1 to 260).map(i => s"${i % 10}${(i * 7) % 10}").mkString
    val txt2 = txt1.reverse
    val big = Seq((1L, txt1), (2L, txt2)).toDF("post_key", "body")
    val e = intercept[Exception] {
      Pipeline.ngramJaccardPairs(big, "post_key", "body",
        dictMaxPerBucket = 1).count()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("gram dictionary exceeds"),
      s"expected the advisory message, got: ${rootMsg(e).take(400)}")
    // and the same corpus passes untouched at the default advisory
    assert(Pipeline.ngramJaccardPairs(big, "post_key", "body")
      .count() >= 0)
    spark.catalog.clearCache()
  }

  test("simhashNeardupPairs: brute-force pairing recall on random corpora") {
    // the p26 oracle now mirrors the pigeonhole candidate generation
    // (cap semantics), so the RECALL proof — every hamming≤3 pair is
    // found, none invented — lives here: pair via the operator, then
    // brute-force all pairs from the same fingerprints in plain Scala
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 40).map(i => s"w$i")
    def doc() = Seq.fill(12 + rnd.nextInt(20))(
      vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = Seq.fill(25)(doc())
    val docs = (base ++ base.take(6) ++ // exact dups → hamming-0 pairs
      base.take(6).map(_ + " w1"))      // light edits → small hammings
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("post_key", "body")
    val fps = Pipeline.simhashFingerprints(df, "post_key", "body")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(expect.exists(_._3 == 0), "fixture must contain exact-dup pairs")
    val got = Pipeline.simhashNeardupPairs(df, "post_key", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect,
      s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("minhashNeardupPairs: sound jaccards and guaranteed exact-dup recall") {
    // LSH recall is probabilistic for mid-similarity pairs, but two
    // properties are DETERMINISTIC and pin the whole pipeline: every
    // reported jaccard must equal the true shingle-set Jaccard (the
    // verification join is exact), and identical texts — identical
    // signatures in every band — must always pair
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = (1 to 50).map(i => s"w$i")
    def doc() = Seq.fill(8 + rnd.nextInt(30))(
      vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = Seq.fill(20)(doc())
    val docs = (base ++ base.take(5))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("post_key", "body")
    val truth = docs.map { case (id, s) =>
      id -> s.split("\\s+").toSeq.sliding(5).map(_.mkString(" ")).toSet
    }.toMap
    def trueJ(a: Long, b: Long): Double = {
      val (sa, sb) = (truth(a), truth(b))
      (sa & sb).size.toDouble / (sa | sb).size
    }
    val got = Pipeline.minhashNeardupPairs(df, "post_key", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    spark.catalog.clearCache()
    got.foreach { case (a, b, j) =>
      assert(math.abs(j - trueJ(a, b)) < 1e-12 && j >= 0.5, s"($a,$b,$j)")
    }
    val pairsFound = got.map(p => (p._1, p._2)).toSet
    (0 until 5).foreach { i =>
      assert(pairsFound.contains((i.toLong, (20 + i).toLong)),
        s"exact dup ($i,${20 + i}) missed")
    }
  }

  test("ngramJaccardPairs matches a brute-force reference on random corpora") {
    import spark.implicits._
    // the prefix-filter length |s| - ceil(t*|s|) + 1 is exactly where an
    // off-by-one silently LOSES pairs while every fixture still passes
    // (fixtures have jaccard far from t) — so sweep thresholds and caps
    // against plain-Scala ground truth on adversarially small alphabets
    // (heavy gram sharing, sets of every parity)
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd "
    def randDoc(len: Int) =
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 2).foreach { _ =>
      val base = Seq.fill(12)(randDoc(8 + rnd.nextInt(25)))
      val docs = (base ++ base.take(4) ++ // exact dups
        base.take(4).map(d => d.updated(rnd.nextInt(d.length), 'a'))) // edits
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("post_key", "body")
      for (t <- Seq(0.3, 0.5, 0.9); cap <- Seq(1000, 6)) {
        val got = Pipeline.ngramJaccardPairs(df, "post_key", "body",
            n = 3, minJaccard = t, dfCap = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSet
        spark.catalog.clearCache()
        val sets = docs.map { case (id, s) =>
          id -> s.sliding(3).filter(_.length == 3).toSet
        }
        val dfc = sets.flatMap(_._2.toSeq).groupBy(identity)
          .map { case (g, xs) => g -> xs.size }
        val kept = sets.map { case (id, s) =>
          id -> s.filter(g => dfc(g) <= cap) }
        val expect = (for {
          (a, sa) <- kept; (b, sb) <- kept if a < b
          c = (sa & sb).size
          u = sa.size + sb.size - c
          if u > 0 && c.toDouble / u >= t
        } yield (a, b, c.toDouble / u)).toSet
        assert(got == expect, s"t=$t cap=$cap: " +
          s"missing=${expect -- got} extra=${got -- expect}")
      }
    }
  }

  test("ngramJaccardPairs: adversarial thresholds, tiny and boundary-size sets") {
    import spark.implicits._
    // n = 1 makes a doc's gram set exactly its distinct characters, so
    // set sizes and overlaps can be CONSTRUCTED instead of sampled. The
    // ceil/epsilon guards (relaxed()) are sharpest where t*|s| is an
    // integer in rational arithmetic but IEEE lands a hair above it
    // (100 * 0.07 == 7.000000000000001, 100 * 0.99 == 99.00000000000001)
    // and where sets are tiny or equal-size, making the index-prefix
    // and positional bounds touch their ceilings exactly.
    def ch(i: Int): Char = ('一' + i).toChar
    def doc(ids: Seq[Int]): String = ids.map(ch).mkString
    def check(docs: Seq[(Long, String)], t: Double, cap: Int): Unit = {
      val got = Pipeline.ngramJaccardPairs(docs.toDF("post_key", "body"),
          "post_key", "body", n = 1, minJaccard = t, dfCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      spark.catalog.clearCache()
      val sets = docs.map { case (id, s) => id -> s.toSeq.toSet }
      val dfc = sets.flatMap(_._2.toSeq).groupBy(identity)
        .map { case (g, xs) => g -> xs.size }
      val kept = sets.map { case (id, s) => id -> s.filter(g => dfc(g) <= cap) }
      val expect = (for {
        (a, sa) <- kept; (b, sb) <- kept if a < b
        c = (sa & sb).size
        u = sa.size + sb.size - c
        if u > 0 && c.toDouble / u >= t
      } yield (a, b, c.toDouble / u)).toSet
      assert(got == expect,
        s"t=$t cap=$cap: missing=${expect -- got} extra=${got -- expect}")
    }
    // (1) tiny sets: every non-empty subset of a 6-char pool — all
    // sizes 1..6, every overlap/parity combination, equal-size pairs
    // at J exactly = t (e.g. {0,1,2} vs {0,1,3} = 2/4 at t = 0.5),
    // plus an exact duplicate of the full pool and a singleton
    val pool = 0 until 6
    val tiny = (1 until 64).map { m =>
      m.toLong -> doc(pool.filter(i => (m & (1 << i)) != 0))
    } ++ Seq(100L -> doc(pool), 101L -> doc(Seq(0)))
    // (2) |s| = 100 ladder at the t = 0.07 integer boundary: ladder
    // doc k shares exactly 2k chars with every later ladder doc (the
    // remainder is unique), so J(j,k) = 2j/(200-2j) sweeps across the
    // threshold; doc 250 is a 7-subset of the shared block, hitting
    // J = 7/100 EXACTLY against the k = 12 doc at t = 0.07
    val ladder = (0 to 12).map { k =>
      (200L + k) -> doc((0 until 2 * k) ++
        (1000 + 100 * k until 1000 + 100 * k + (100 - 2 * k)))
    } :+ (250L -> doc(0 until 7))
    // (3) near-identical large sets at the t = 0.99 boundary:
    // J(300,301) = J(300,302)... brute force decides; 199/201 ≈ .99005
    // straddles .99 against 198/202 ≈ .9802, and 303 duplicates 300
    val big = Seq(
      300L -> doc(0 until 200),
      301L -> doc((0 until 199) :+ 5000),
      302L -> doc((1 until 200) :+ 5001),
      303L -> doc(0 until 200),
      304L -> doc(0 until 199))
    for (t <- Seq(0.07, 0.5, 0.99)) {
      check(tiny, t, 1000)
      check(tiny, t, 33) // char 0 has df 34, chars 1..5 df 33: cap splits
      check(ladder, t, 1000)
      check(big, t, 1000)
    }
  }

  test("sharedKgramCounts hashKeys variant matches the string-key counts") {
    import spark.implicits._
    val a = mk((1 to 30).map(i => s"w$i"))
    val b = mk((1 to 20).map(i => s"w$i") ++ (1 to 10).map(i => s"z$i"))
    val tr = Seq((1L, b)).toDF("post_key", "body")
    val ev = Seq((9L, a)).toDF("post_key", "body")
    def counts(hash: Boolean) =
      Pipeline.sharedKgramCounts(tr, ev, "post_key", "body", 5, hashKeys = hash)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(counts(false) == counts(true) && counts(false) == Seq((1L, 9L, 16L)))
  }

  test("knnBruteCosine: alien column names, known neighbor order") {
    import spark.implicits._
    // unit-ish 2-d vectors at known angles: 0°, 30°, 60°, 90°
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val vecs = Seq((1L, v(0)), (2L, v(30)), (3L, v(60)), (4L, v(90)))
      .toDF("pk", "vec")
    val res = Pipeline.knnBruteCosine(
      vecs, vecs.filter(col("pk") === 1L), "pk", "vec", k = 2)
      .orderBy("rk").collect()
    assert(res.map(_.getLong(res.head.fieldIndex("vec_id"))).toSeq ==
      Seq(2L, 3L)) // 30° beats 60°; 90° (orthogonal) excluded by k=2
    assert(res.forall(_.getLong(0) == 1L))
  }

  test("kmeansCluster: alien column names, two well-separated clusters") {
    import spark.implicits._
    val pts = Seq(
      (1L, Array(0.1f, 0.0f)), (3L, Array(0.0f, 0.2f)), (5L, Array(0.2f, 0.1f)),
      (2L, Array(9.9f, 10.0f)), (4L, Array(10.0f, 9.8f)), (6L, Array(10.1f, 10.0f)))
      .toDF("pk", "vec")
    val asg = Pipeline.kmeansCluster(pts, "pk", "vec", k = 2, dim = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // seeds are ids 1 and 2 (the two smallest), one in each blob
    assert(asg(1L) == asg(3L) && asg(3L) == asg(5L))
    assert(asg(2L) == asg(4L) && asg(4L) == asg(6L))
    assert(asg(1L) != asg(2L))
  }

  test("ivfSearch: probes the best cluster only; alien column names") {
    import spark.implicits._
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    // cluster 7 around 0°, cluster 9 around 90°; query at 80° must
    // probe cluster 9 and NEVER see cluster 7's members
    val pts = Seq(
      (1L, 7, v(0)), (2L, 7, v(10)), (3L, 7, v(20)),
      (4L, 9, v(90)), (5L, 9, v(80)), (6L, 9, v(70)))
      .toDF("pk", "grp", "vec")
    val res = Pipeline.ivfSearch(
      pts, Seq((5L, v(80))).toDF("pk", "vec"), "pk", "vec", "grp", k = 5)
      .collect()
    assert(res.forall(_.getInt(res.head.fieldIndex("probe_label")) == 9))
    // k=5 asked, but only the probed cluster's OTHER members return
    assert(res.map(_.getLong(res.head.fieldIndex("vec_id"))).sorted.toSeq ==
      Seq(4L, 6L))
    // nprobe=2 widens the scan to the second-best cluster: the recall
    // knob recovers cluster 7's members, ranked below cluster 9's
    val res2 = Pipeline.ivfSearch(
      pts, Seq((5L, v(80))).toDF("pk", "vec"), "pk", "vec", "grp",
      k = 5, nprobe = 2)
      .orderBy("rk").collect()
    assert(res2.map(_.getLong(res2.head.fieldIndex("vec_id"))).toSeq ==
      Seq(4L, 6L, 3L, 2L, 1L)) // 90°,70° then 20°,10°,0° by cos to 80°
    // nprobe = n_clusters must agree with brute force exactly
    val brute = Pipeline.knnBruteCosine(
      pts.select(col("pk"), col("vec")), Seq((5L, v(80))).toDF("pk", "vec"),
      "pk", "vec", k = 5)
      .orderBy("rk").collect().map(_.getLong(1))
    assert(res2.map(_.getLong(res2.head.fieldIndex("vec_id"))).toSeq ==
      brute.toSeq)
  }

  test("kmeansPlusPlusSeeds: spread + SSE beats min-id seeding on clustered corpora") {
    // the degenerate case the D²-weighted seeding exists for: 4 tight,
    // well-separated blobs with the k SMALLEST ids all in blob 0, so
    // min-id seeding starts every centroid inside one blob. The draw
    // is hash-deterministic, so once green this stays green.
    import spark.implicits._
    val dim = 8
    for (seed <- Seq(7, 13, 42)) {
      val rnd = new scala.util.Random(seed)
      val centers = (0 until 4).map { b =>
        Array.tabulate(dim)(i =>
          (if (i == b) 60.0 + rnd.nextDouble() * 10 else rnd.nextDouble() * 5))
      }
      val pts = (for {
        b <- 0 until 4; i <- 0 until 30
      } yield ((b * 30 + i).toLong,
        centers(b).map(c => (c + rnd.nextGaussian() * 0.5).toFloat)))
        .toDF("pk", "vec")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val seeds = Pipeline.kmeansPlusPlusSeeds(pts, "pk", "vec",
          k = 4, dim = dim)
          .collect().map(r => (r.getInt(0), r.getLong(1)))
        assert(seeds.map(_._1).toSeq == Seq(0, 1, 2, 3))
        // one seed per blob: D² mass concentrates on unseeded blobs
        assert(seeds.map(_._2 / 30).toSet.size == 4,
          s"rnd=$seed seeds not spread across blobs: ${seeds.toSeq}")
        def sse(seeding: String): Double =
          Pipeline.kmeansCluster(pts, "pk", "vec", k = 4, dim = dim,
            iters = 2, seeding = seeding)
            .agg(sum(col("d2"))).collect()(0).getDouble(0)
        val (pp, minId) = (sse("kmeans++"), sse("min-id"))
        assert(pp <= minId,
          s"rnd=$seed kmeans++ SSE $pp worse than min-id $minId")
        // determinism across invocations (RNG-free draw)
        val again = Pipeline.kmeansPlusPlusSeeds(pts, "pk", "vec",
          k = 4, dim = dim)
          .collect().map(r => (r.getInt(0), r.getLong(1)))
        assert(again.toSeq == seeds.toSeq)
      } finally pts.unpersist()
    }
  }

  test("kmeansParallelSeeds: spread, SSE parity, determinism, short return") {
    import spark.implicits._
    // same adversarial corpus as the kmeans++ test: 4 tight blobs with
    // the k smallest ids all in blob 0. k-means|| must ALSO spread its
    // seeds (one per blob) and never lose to min-id seeding — while
    // taking O(rounds) corpus passes instead of k-1.
    val dim = 8
    for (seed <- Seq(7, 42)) {
      val rnd = new scala.util.Random(seed)
      val centers = (0 until 4).map { b =>
        Array.tabulate(dim)(i =>
          (if (i == b) 60.0 + rnd.nextDouble() * 10 else rnd.nextDouble() * 5))
      }
      val pts = (for {
        b <- 0 until 4; i <- 0 until 30
      } yield ((b * 30 + i).toLong,
        centers(b).map(c => (c + rnd.nextGaussian() * 0.5).toFloat)))
        .toDF("pk", "vec")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val seeds = Pipeline.kmeansParallelSeeds(pts, "pk", "vec",
          k = 4, dim = dim, rounds = 3)
          .collect().map(r => (r.getInt(0), r.getLong(1)))
        assert(seeds.map(_._1).toSeq == Seq(0, 1, 2, 3))
        assert(seeds.map(_._2 / 30).toSet.size == 4,
          s"rnd=$seed seeds not spread across blobs: ${seeds.toSeq}")
        def sse(seeding: String): Double =
          Pipeline.kmeansCluster(pts, "pk", "vec", k = 4, dim = dim,
            iters = 2, seeding = seeding)
            .agg(sum(col("d2"))).collect()(0).getDouble(0)
        assert(sse("kmeans||") <= sse("min-id"),
          s"rnd=$seed kmeans|| SSE worse than min-id")
        // determinism across invocations (hash-based draw, ordered
        // candidate collect, BigInt driver reduction)
        val again = Pipeline.kmeansParallelSeeds(pts, "pk", "vec",
          k = 4, dim = dim, rounds = 3)
          .collect().map(r => (r.getInt(0), r.getLong(1)))
        assert(again.toSeq == seeds.toSeq)
      } finally pts.unpersist()
    }
  }

  test("seeding releases its per-round checkpoints: no persistent RDDs leak") {
    import spark.implicits._
    // both seeding loops localCheckpoint corpus-sized state per round;
    // the superseded rounds must be unpersisted as the loop advances
    // (at 100 TB, k-1 live copies vs ~2) — pin it via the context's
    // persistent-RDD registry so a Spark upgrade that changes the plan
    // shape (and silently skips the release) fails here
    val rnd = new scala.util.Random(5)
    val pts = (0L until 60L).map(i =>
      (i, Array.fill(4)(rnd.nextFloat() * 10f))).toDF("pk", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      pts.count()
      val before = spark.sparkContext.getPersistentRDDs.keySet
      Pipeline.kmeansPlusPlusSeeds(pts, "pk", "vec", k = 4, dim = 4).collect()
      Pipeline.kmeansParallelSeeds(pts, "pk", "vec", k = 4, dim = 4,
        rounds = 2).collect()
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"seeding leaked persistent RDDs: $leaked")
    } finally pts.unpersist()
  }

  test("kmeansParallelSeeds: edge parameters stay valid and deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val pts = (0L until 40L).map(i =>
      (i, Array.fill(4)(rnd.nextFloat() * 10f))).toDF("pk", "vec")
    // rounds = 1 with a sub-1 oversample: the candidate pool may be
    // tiny (possibly anchor-only), but output stays well-formed —
    // selection-ordered cl, seeds drawn from the corpus, never more
    // than k, and reproducible
    val s1 = Pipeline.kmeansParallelSeeds(pts, "pk", "vec", k = 3, dim = 4,
      rounds = 1, oversample = 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(s1.nonEmpty && s1.length <= 3)
    assert(s1.map(_._1) == s1.indices)
    assert(s1.map(_._2).forall(id => id >= 0 && id < 40))
    val s2 = Pipeline.kmeansParallelSeeds(pts, "pk", "vec", k = 3, dim = 4,
      rounds = 1, oversample = 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(s1 == s2)
    // invalid parameters fail fast
    intercept[IllegalArgumentException] {
      Pipeline.kmeansParallelSeeds(pts, "pk", "vec", k = 3, dim = 4, rounds = 0)
    }
    intercept[IllegalArgumentException] {
      Pipeline.kmeansParallelSeeds(pts, "pk", "vec", k = 3, dim = 4,
        oversample = -2)
    }
  }

  test("kmeansParallelSeeds: duplicate-exhausted corpus returns a short seed list") {
    import spark.implicits._
    // two distinct points among three rows: the candidate pool can
    // cover both, but the third driver-side pick has zero D² mass
    // everywhere — short return, same contract as kmeansPlusPlusSeeds
    val pts = Seq((1L, Array(1f, 2f)), (2L, Array(1f, 2f)),
      (3L, Array(5f, 5f))).toDF("pk", "vec")
    val seeds = Pipeline.kmeansParallelSeeds(pts, "pk", "vec", k = 3, dim = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(seeds == Seq(1L, 3L))
  }

  test("kmeansPlusPlusSeeds: duplicate-exhausted corpus returns a short seed list") {
    import spark.implicits._
    // two distinct points among three rows: after both are chosen all
    // remaining D² mass is 0 — the third draw has no interval to hit,
    // so the list comes back short instead of looping or throwing
    val pts = Seq((1L, Array(1f, 2f)), (2L, Array(1f, 2f)),
      (3L, Array(5f, 5f))).toDF("pk", "vec")
    val seeds = Pipeline.kmeansPlusPlusSeeds(pts, "pk", "vec", k = 3, dim = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(seeds == Seq(1L, 3L))
  }

  test("ivfSearch: trained-centroid quantizer; recall@k monotone in nprobe") {
    import spark.implicits._
    // random corpus, kmeansFit centroids as the trained quantizer —
    // recall@k against brute force must be non-decreasing in nprobe
    // (candidate sets are nested supersets: an exact top-k member that
    // enters the candidate set can never leave the reported top-k),
    // and probing every cluster must reach recall 1.0
    val rnd = new scala.util.Random(11)
    val dim = 8
    val kClusters = 4
    val vecs = (0L until 120L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      .toDF("pk", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cents = Pipeline.kmeansFit(vecs, "pk", "vec", kClusters, dim)
      val member = Pipeline.kmeansCluster(vecs, "pk", "vec", kClusters, dim)
        .select(col("vec_id").as("pk"), col("cluster"))
      val corpus = vecs.join(member, "pk")
      val queries = vecs.filter(col("pk") % 12 === 0)
      val topK = 5
      val brute = Pipeline.knnBruteCosine(vecs, queries, "pk", "vec", topK)
        .select(col("q_id"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val recalls = Seq(1, 2, 4).map { nprobe =>
        val got = Pipeline.ivfSearch(corpus, queries, "pk", "vec", "cluster",
          topK, nprobe = nprobe, centroids = Some(cents))
          .select(col("q_id"), col("vec_id")).collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val hits = brute.toSeq.map { case (q, t) =>
          t.intersect(got.getOrElse(q, Set.empty)).size }.sum
        hits.toDouble / brute.values.map(_.size).sum
      }
      assert(recalls == recalls.sorted,
        s"recall not monotone in nprobe: $recalls")
      assert(recalls.last == 1.0,
        s"nprobe = n_clusters must equal brute force, got ${recalls.last}")

      // the full production training path: ivfIndex (one kmeans||-
      // seeded fit + one assignment pass) feeding the trained-quantizer
      // IVF — probing every cluster must still be exhaustive
      // regardless of how the quantizer was seeded
      val (member2raw, cents2) = Pipeline.ivfIndex(vecs, "pk", "vec",
        kClusters, dim)
      val member2 = member2raw.select(col("vec_id").as("pk"), col("cluster"))
      val got2 = Pipeline.ivfSearch(vecs.join(member2, "pk"), queries,
        "pk", "vec", "cluster", topK, nprobe = kClusters,
        centroids = Some(cents2))
        .select(col("q_id"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      assert(got2 == brute,
        "kmeans||-trained IVF at nprobe = n_clusters must equal brute force")
    } finally vecs.unpersist() // exception-safe: a failed assert must not leak the cache
  }

  test("pq: m=1 ksub=n degenerates to exact euclidean ranking; complete-codebook gate") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 8
    val n = 30
    val data = (0L until n).map(i =>
      i -> Array.fill(dim)(rnd.nextFloat() * 2f - 1f)).toMap
    val vecs = data.toSeq.sortBy(_._1).toDF("pk", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one subspace with a code per vector: codes are the identity and
      // ADC distance = exact squared euclidean (up to the 1e-7 centroid
      // quantization of the integer-exact update — far below the
      // inter-vector gaps of a random corpus), so the ranking must
      // EQUAL brute force
      val books = Pipeline.pqTrain(vecs, "pk", "vec", dim, m = 1,
        ksub = n, iters = 1)
      val codes = Pipeline.pqEncode(vecs, "pk", "vec", books, dim, m = 1)
      val queries = vecs.filter(col("pk") < 3)
      def run() = Pipeline.pqSearch(codes, queries, books, "pk", "vec",
        k = 4, dim, m = 1, ksub = n)
        .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
      val got = run()
      def d2(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) {
          val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
        }
        s
      }
      val expected = (0L until 3L).flatMap { q =>
        (0L until n).filter(_ != q)
          .sortBy(v => (d2(data(q), data(v)), v))
          .take(4).zipWithIndex.map { case (v, i) => (q, i + 1, v) }
      }
      assert(got.sortBy(t => (t._1, t._2)).toSeq == expected,
        "PQ at m=1, ksub=n must reproduce the exact euclidean top-k")
      assert(run().toSeq == got.toSeq, "pqSearch must be deterministic")
      // an INCOMPLETE codebook (a dropped (j, code) cell would silently
      // misalign the arithmetic lookup index) is rejected eagerly
      val holed = books.filter(!(col("j") === 0 && col("code") === 0))
      val e = intercept[IllegalArgumentException](
        Pipeline.pqSearch(codes, queries, holed, "pk", "vec",
          k = 4, dim, m = 1, ksub = n))
      assert(e.getMessage.contains("complete"))
    } finally vecs.unpersist()
  }

  test("ivfpqSearch: probing every cluster equals full-corpus pqSearch; recall monotone") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val dim = 8
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))).toDF("pk", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val kClusters = 3
      val (member, cents) = Pipeline.ivfIndex(vecs, "pk", "vec", kClusters, dim)
      val books = Pipeline.pqTrain(vecs, "pk", "vec", dim, m = 2, ksub = 4)
      val codes = Pipeline.pqEncode(vecs, "pk", "vec", books, dim, m = 2)
      val queries = vecs.filter(col("pk") < 3)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select(col("q_id"), col("vec_id"), col("adist"), col("rk"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val full = rows(Pipeline.pqSearch(codes, queries, books,
        "pk", "vec", k = 5, dim, m = 2, ksub = 4))
      // nprobe = n_clusters scans every member — identical result set,
      // bit-identical adist (same lookup tables, same fixed-order sum)
      val exhaustive = rows(Pipeline.ivfpqSearch(member, codes, queries,
        cents, books, "pk", "vec", k = 5, dim, m = 2, ksub = 4,
        nprobe = kClusters))
      assert(exhaustive == full,
        "IVFPQ at nprobe = n_clusters must equal full-corpus ADC")
      // recall vs the exhaustive set is monotone in nprobe
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select(col("q_id"), col("vec_id"))
      val recalls = Seq(1, 2, 3).map { np =>
        val approx = Pipeline.ivfpqSearch(member, codes, queries, cents,
          books, "pk", "vec", k = 5, dim, m = 2, ksub = 4, nprobe = np)
        Pipeline.recallAtK(ids(approx),
          ids(Pipeline.pqSearch(codes, queries, books,
            "pk", "vec", k = 5, dim, m = 2, ksub = 4)))
          .agg(org.apache.spark.sql.functions.avg(col("recall")))
          .collect()(0).getDouble(0)
      }
      assert(recalls == recalls.sorted,
        s"IVFPQ recall not monotone in nprobe: $recalls")
      assert(recalls.last == 1.0)
    } finally vecs.unpersist()
  }

  test("ivfPqSearchRefined: exact re-rank of the ADC pool; recall >= plain ADC, full pool = 1.0") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val dim = 8
    val n = 60
    val data = (0L until n).map(i =>
      i -> Array.fill(dim)(rnd.nextFloat() * 2f - 1f)).toMap
    val vecs = data.toSeq.sortBy(_._1).toDF("pk", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val kClusters = 3
      val (member, cents) = Pipeline.ivfIndex(vecs, "pk", "vec", kClusters, dim)
      val books = Pipeline.pqTrain(vecs, "pk", "vec", dim, m = 2, ksub = 4)
      val codes = Pipeline.pqEncode(vecs, "pk", "vec", books, dim, m = 2)
      val queries = vecs.filter(col("pk") < 3)
      val k = 5
      def d2(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) {
          val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
        }
        s
      }
      // 1) the refined result IS the exact re-rank of the ADC pool:
      //    recompute pool top-(k·c) locally from the plain ADC scan,
      //    re-rank by exact distance, compare bit-for-bit
      val cFactor = 3
      val pool = Pipeline.ivfpqSearch(member, codes, queries, cents, books,
        "pk", "vec", k * cFactor, dim, m = 2, ksub = 4, nprobe = kClusters)
        .select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val expected = pool.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
        cs.map(_._2)
          .map(v => (q, v, d2(data(q), data(v))))
          .sortBy { case (_, v, e) => (e, v) }
          .take(k).zipWithIndex
          .map { case ((qq, v, e), i) => (qq, v, e, i + 1) }
      }.toSet
      val refined = Pipeline.ivfPqSearchRefined(member, codes, queries,
        cents, books, vecs, "pk", "vec",
        k, dim, m = 2, ksub = 4, nprobe = kClusters, cFactor = cFactor)
      val got = refined.collect().map(r =>
        (r.getLong(r.fieldIndex("q_id")), r.getLong(r.fieldIndex("vec_id")),
          r.getDouble(r.fieldIndex("edist")), r.getInt(r.fieldIndex("rk"))))
        .toSet
      assert(got == expected,
        "refined top-k must equal the exact re-rank of the ADC pool")
      // 2) recall vs exact brute-force ground truth: refine never hurts,
      //    and a pool covering the whole corpus recovers recall 1.0
      val exact = (0L until 3L).flatMap { q =>
        (0L until n).filter(_ != q)
          .map(v => (q, v, d2(data(q), data(v))))
          .sortBy { case (_, v, e) => (e, v) }.take(k)
          .map { case (qq, v, _) => (qq, v) }
      }.toDF("q_id", "vec_id")
      def avgRecall(df: org.apache.spark.sql.DataFrame): Double =
        Pipeline.recallAtK(df.select(col("q_id"), col("vec_id")), exact)
          .agg(org.apache.spark.sql.functions.avg(col("recall")))
          .collect()(0).getDouble(0)
      val adcRecall = avgRecall(Pipeline.ivfpqSearch(member, codes, queries,
        cents, books, "pk", "vec", k, dim, m = 2, ksub = 4,
        nprobe = kClusters))
      val refinedRecall = avgRecall(refined)
      assert(refinedRecall >= adcRecall,
        s"refine must not hurt recall: refined=$refinedRecall adc=$adcRecall")
      val fullPool = avgRecall(Pipeline.ivfPqSearchRefined(member, codes,
        queries, cents, books, vecs, "pk", "vec",
        k, dim, m = 2, ksub = 4, nprobe = kClusters, cFactor = (n / k).toInt))
      assert(fullPool == 1.0,
        s"a corpus-wide pool probing every cluster must be exact, got $fullPool")
      // the lossy m=2/ksub=4 codes DO misrank on this corpus — the
      // refine stage is load-bearing here, not vacuously >= (pinned so
      // the fixture can't silently degenerate to adc == exact)
      assert(adcRecall < 1.0, s"fixture degenerated: ADC already exact")
      assert(refinedRecall > adcRecall,
        s"refine should strictly improve on the lossy codes: " +
          s"refined=$refinedRecall adc=$adcRecall")
    } finally vecs.unpersist()
  }

  test("ivfpqSearch residual mode: m=1 ksub=n reproduces exact euclidean ranking") {
    import spark.implicits._
    // residual IVFADC with a code per vector: v encodes as r(v) =
    // v − c(cluster(v)) exactly (up to float rounding + 1e-7 centroid
    // quantization), each probe's table is built on q − c(probe), and
    // a vector is scanned only under its OWN cluster's probe — so
    // adist = d²((q−c) , (v−c)) ≈ d²(q, v) and, probing every
    // cluster, the ranking must equal brute-force euclidean on a
    // random corpus (error ≪ inter-vector gaps)
    val rnd = new scala.util.Random(31)
    val dim = 8
    val n = 40
    val data = (0L until n).map(i =>
      i -> Array.fill(dim)(rnd.nextFloat() * 2f - 1f)).toMap
    val vecs = data.toSeq.sortBy(_._1).toDF("pk", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val kClusters = 3
      val (member, cents) = Pipeline.ivfIndex(vecs, "pk", "vec",
        kClusters, dim, seedRounds = 2)
      val resid = Pipeline.pqResiduals(vecs, "pk", "vec", member, cents)
      val books = Pipeline.pqTrain(resid, "vec_id", "residual", dim,
        m = 1, ksub = n, iters = 1)
      val codes = Pipeline.pqEncode(resid, "vec_id", "residual", books,
        dim, m = 1)
      val queries = vecs.filter(col("pk") < 3)
      val got = Pipeline.ivfpqSearch(member, codes, queries, cents, books,
        "pk", "vec", k = 4, dim, m = 1, ksub = n, nprobe = kClusters,
        residual = true)
        .collect().map(r =>
          (r.getLong(0), r.getInt(r.fieldIndex("rk")), r.getLong(r.fieldIndex("vec_id"))))
      def d2(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) {
          val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
        }
        s
      }
      val expected = (0L until 3L).flatMap { q =>
        (0L until n).filter(_ != q)
          .sortBy(v => (d2(data(q), data(v)), v))
          .take(4).zipWithIndex.map { case (v, i) => (q, i + 1, v) }
      }
      assert(got.sortBy(t => (t._1, t._2)).toSeq == expected,
        "residual IVFADC at m=1, ksub=n, nprobe=all must match brute euclidean")
    } finally vecs.unpersist()
  }

  test("chunkText: tail rule, exact-boundary, short doc, overlap invariant") {
    import spark.implicits._
    def wordsOf(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, wordsOf(10) + "\n"),  // one chunk exactly — the trailing
                                 // newline's empty token must NOT
                                 // count as an 11th word (r10 review)
      (2L, " " + wordsOf(3)),    // short doc, leading whitespace
      (3L, wordsOf(11)),         // one word past the boundary: 2 chunks
      (4L, wordsOf(25))).        // 4 chunks, short tail
      toDF("doc_id", "text")
    val got = operators.Pipeline.chunkText(docs, "doc_id", "text",
      chunkWords = 10, overlapWords = 4)
      .orderBy("doc_id", "chunk_no").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.toSeq).toMap
    assert(byDoc(1L).map(t => (t._2, t._3, t._4)) == Seq((0, 0L, 10L)))
    assert(byDoc(2L) == Seq((2L, 0, 0L, 3L, "w1 w2 w3")))
    // stride 6: doc 3 chunks cover [0,10) and [6,11) — 5-word tail
    assert(byDoc(3L).map(t => (t._2, t._3, t._4)) ==
      Seq((0, 0L, 10L), (1, 6L, 5L)))
    assert(byDoc(4L).map(t => (t._2, t._3, t._4)) ==
      Seq((0, 0L, 10L), (1, 6L, 10L), (2, 12L, 10L), (3, 18L, 7L)))
    // overlap invariant: consecutive chunks share exactly overlapWords
    // words (except a tail shorter than the overlap)
    byDoc(4L).sliding(2).foreach { case Seq(a, b) =>
      val aw = a._5.split(" ").toSeq
      val bw = b._5.split(" ").toSeq
      assert(aw.takeRight(4) == bw.take(4))
    }
    // every word appears in at least one chunk, in order
    val doc4 = byDoc(4L).flatMap(_._5.split(" ")).distinct
    assert(doc4 == (1 to 25).map(i => s"w$i"))
  }

  test("stratifiedSplit: exact per-stratum counts, deterministic, fraction gate") {
    import spark.implicits._
    // 20 rows in stratum A, 7 in B: exact counts are 16/2/2 and 5/0/2
    val rows = ((1L to 20L).map(i => (i, "A")) ++
      (21L to 27L).map(i => (i, "B"))).toDF("id", "s")
    val got = operators.Pipeline.stratifiedSplit(rows, "id", "s",
      trainFrac = 0.8, valFrac = 0.1)
    val counts = got.groupBy("s", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts == Map(("A", "train") -> 16L, ("A", "val") -> 2L,
      ("A", "test") -> 2L, ("B", "train") -> 5L, ("B", "test") -> 2L))
    // deterministic: the same call yields the same assignment
    val a = got.orderBy("id").collect().map(_.toSeq)
    val b = operators.Pipeline.stratifiedSplit(rows, "id", "s",
      trainFrac = 0.8, valFrac = 0.1).orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // caller columns survive; rk is the within-stratum md5 rank
    assert(got.columns.toSeq == Seq("id", "s", "rk", "split"))
    // invalid fractions are rejected
    intercept[IllegalArgumentException](
      operators.Pipeline.stratifiedSplit(rows, "id", "s", 0.8, 0.3))
  }

  test("gopherQualitySignals: each rule fires on its own violation shape") {
    import spark.implicits._
    val goodBody = ("the be to of and that have with " +
      (1 to 42).map(i => s"word$i").mkString(" "))
    val docs = Seq(
      (1L, goodBody),                                    // passes everything
      (2L, "the of " + (1 to 8).map(i => s"w$i").mkString(" ")), // too few words
      (3L, goodBody + "\n- a\n- b\n- c\n- d\n- e\n- f"), // bullet lines
      (4L, goodBody + " ##### ### ## # #### ## # ###"),  // symbol ratio
      (5L, ("the of " + (1 to 48).map(_ => "12345").mkString(" "))), // no alpha words
      (6L, (1 to 50).map(i => s"word$i").mkString(" "))) // zero stop words
      .toDF("doc_id", "text")
    val got = operators.Pipeline.gopherQualitySignals(docs, "doc_id", "text")
      .select("doc_id", "pass", "n_words", "bullet_ratio", "symbol_ratio",
        "alpha_ratio", "n_stopwords")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false))
    // ellipsis-ended lines: > 30% of lines trip the rule
    val ell = Seq((7L, goodBody + "\nso...\nmore...\nyes...\nend"))
      .toDF("doc_id", "text")
    val e = operators.Pipeline.gopherQualitySignals(ell, "doc_id", "text")
      .select("pass", "ellipsis_ratio").collect()(0)
    assert(!e.getBoolean(0) && e.getDouble(1) == 3.0 / 5.0)
    // empty/whitespace-only docs with minWords = 0: the ratios are NULL
    // and pass must be FALSE, not NULL — a NULL verdict escapes both
    // filter(pass) and filter(!pass), silently vanishing the doc from
    // the reject set (ADVICE r10)
    val empty = Seq((8L, ""), (9L, "   \n  ")).toDF("doc_id", "text")
    val ev = operators.Pipeline.gopherQualitySignals(
        empty, "doc_id", "text", minWords = 0)
      .select("doc_id", "pass").collect()
    assert(ev.forall(r => !r.isNullAt(1) && !r.getBoolean(1)))
  }

  test("sparseTopK: shared-term scoring, ranking, self-exclusion, alien columns") {
    import spark.implicits._
    // postings: doc 1 {a:2, b:1}, doc 2 {a:1, c:3}, doc 3 {b:4},
    // doc 4 {z:9} (no overlap with the query)
    val post = Seq(
      (1L, "a", 2.0), (1L, "b", 1.0),
      (2L, "a", 1.0), (2L, "c", 3.0),
      (3L, "b", 4.0), (4L, "z", 9.0)).toDF("doc_id", "term", "weight")
    val q = post.filter(col("doc_id") === 1L)
    val got = Pipeline.sparseTopK(post, q, k = 3)
      .orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // scores vs doc 1: doc 2 = 2·1 = 2 (term a), doc 3 = 1·4 = 4
    // (term b), doc 4 absent (no shared term), self excluded
    assert(got.toSeq == Seq((3L, 4.0, 1), (2L, 2.0, 2)))
    // excludeSelf = false ranks the query doc itself first (2·2+1·1=5)
    val self = Pipeline.sparseTopK(post, q, k = 1, excludeSelf = false)
      .collect()(0)
    assert(self.getLong(1) == 1L && self.getDouble(2) == 5.0)
    // alien column names
    val alien = Pipeline.sparseTopK(
      post.toDF("d", "t", "x"), q.toDF("d", "t", "x"),
      idCol = "d", termCol = "t", weightCol = "x", k = 2)
    assert(alien.columns.toSeq == Seq("q_id", "doc_id", "score", "rk"))
  }

  test("capPostingsByDf: over-cap terms drop; surviving-term scores unchanged") {
    import spark.implicits._
    // term 's' is a stop term in 4 docs; 'a'/'b'/'c' are in <= 2 docs
    val post = Seq(
      (1L, "s", 9.0), (2L, "s", 9.0), (3L, "s", 9.0), (4L, "s", 9.0),
      (1L, "a", 2.0), (1L, "b", 1.0),
      (2L, "a", 1.0), (2L, "c", 3.0),
      (3L, "b", 4.0)).toDF("doc_id", "term", "weight")
    val capped = Pipeline.capPostingsByDf(post, maxDf = 2)
    // the stop term's postings are gone, everything else intact
    assert(capped.columns.toSeq == post.columns.toSeq)
    assert(capped.filter(col("term") === "s").count() == 0)
    assert(capped.count() == 5)
    // a term at EXACTLY the cap survives (cap is inclusive)
    assert(Pipeline.capPostingsByDf(post, maxDf = 4)
      .filter(col("term") === "s").count() == 4)
    // composed with sparseTopK: scores over surviving terms are the
    // SAME as scoring the uncapped postings with the stop term absent
    // from the query — capping removes terms, it never rescales
    val q = capped.filter(col("doc_id") === 1L)
    val got = Pipeline.sparseTopK(capped, q, k = 3)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getDouble(2)))
    val want = Pipeline.sparseTopK(post, q.filter(col("term") =!= "s"), k = 3)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // alien term column name
    assert(Pipeline.capPostingsByDf(post.toDF("d", "t", "x"), 2,
      termCol = "t").count() == 5)
  }

  test("capPostingsByDfFraction: fractional threshold tracks corpus size; " +
      "bm25Retrieval default cap ≡ the hand-composed chain, None ≡ uncapped") {
    import spark.implicits._
    // 4 docs: 'stop' is in all 4 (df 4 = 100%), 'mid' in 2 (50%),
    // 'rare' in 1 (25%)
    val post = Seq(
      (1L, "stop", 1.0), (2L, "stop", 1.0), (3L, "stop", 1.0),
      (4L, "stop", 1.0),
      (1L, "mid", 2.0), (2L, "mid", 2.0),
      (3L, "rare", 5.0)).toDF("doc_id", "term", "weight")
    // fraction 0.5: terms in MORE than 2 of 4 docs drop (cap inclusive)
    val half = Pipeline.capPostingsByDfFraction(post, 0.5)
    assert(half.filter(col("term") === "stop").count() == 0)
    assert(half.count() == 3 &&
      half.columns.toSeq == post.columns.toSeq)
    // fraction 1.0 prunes nothing; bad fractions fail loudly
    assert(Pipeline.capPostingsByDfFraction(post, 1.0).count() == 7)
    intercept[IllegalArgumentException](
      Pipeline.capPostingsByDfFraction(post, 0.0))

    // the front door: capped-by-default retrieval equals composing the
    // pieces by hand, and maxDfFraction = None equals the raw chain
    val docs = Seq(
      (1L, "the quick brown fox jumps the fence"),
      (2L, "the quick red fox naps all day"),
      (3L, "the slow green turtle naps all day"),
      (4L, "the words here differ almost entirely now")
    ).toDF("post_key", "body")
    val qs = docs.filter(col("post_key") <= 2L)
      .select(col("post_key").as("doc_id"),
        explode(array_remove(split(col("body"), "\\s+"), "")).as("term"))
      .distinct().withColumn("weight", lit(1.0))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq
    val gotDefault = rows(Pipeline.bm25Retrieval(
      docs, "post_key", "body", qs, k = 3))
    val wantDefault = rows(Pipeline.sparseTopK(
      Pipeline.capPostingsByDfFraction(
        Pipeline.bm25Postings(docs, "post_key", "body")
          .select(col("doc_id"), col("term"), col("weight")), 0.5),
      qs, k = 3))
    assert(gotDefault == wantDefault && gotDefault.nonEmpty)
    val gotRaw = rows(Pipeline.bm25Retrieval(
      docs, "post_key", "body", qs, k = 3, maxDfFraction = None))
    val wantRaw = rows(Pipeline.sparseTopK(
      Pipeline.bm25Postings(docs, "post_key", "body")
        .select(col("doc_id"), col("term"), col("weight")), qs, k = 3))
    assert(gotRaw == wantRaw && gotRaw.nonEmpty)
    // 'the' is in every doc: the default cap must change the result
    assert(gotDefault != gotRaw)
  }

  test("hashedEmbedding: unit vectors, similarity tracks token overlap, " +
      "composes with knnBruteCosine") {
    import spark.implicits._
    val a = (1 to 60).map(i => s"w$i").mkString(" ")
    val aEdit = (1 to 60).map(i => if (i == 30) "edited" else s"w$i")
      .mkString(" ")
    val z = (1 to 60).map(i => s"zz$i").mkString(" ")
    val docs = Seq((1L, a), (2L, aEdit), (3L, z), (4L, null: String))
      .toDF("post_key", "body")
    val emb = Pipeline.hashedEmbedding(docs, "post_key", "body", dim = 32)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs.keySet == Set(1L, 2L, 3L)) // null text → no row
    assert(vecs.values.forall(_.size == 32))
    // L2-normalized (within float tolerance)
    vecs.values.foreach { v =>
      val n = v.map(x => x.toDouble * x).sum
      assert(math.abs(n - 1.0) < 1e-5, s"norm² = $n")
    }
    def cos(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    // near-identical token multisets → high cosine; disjoint → low
    assert(cos(vecs(1L), vecs(2L)) > 0.9)
    assert(cos(vecs(1L), vecs(3L)) < 0.5)
    // feeds the ANN ladder directly: brute cosine ranks the edit first
    // (output columns are (doc_id, embedding) whatever the input names)
    val knn = Pipeline.knnBruteCosine(emb,
      emb.filter(col("doc_id") === 1L), "doc_id", "embedding", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(knn.toSeq == Seq((1L, 2L)))
  }

  test("chunkText: randomized invariants — coverage, bounds, overlap, count formula") {
    import spark.implicits._
    // one Spark pass over a batch of random docs (seeded), invariants
    // checked per doc in Scala — stronger than the fixed shapes above
    val rnd = new scala.util.Random(17)
    val chunkW = 12; val overlap = 5; val stride = chunkW - overlap
    // words joined by RANDOM whitespace runs so the char-span columns
    // are exercised against genuinely irregular original documents
    val seps = Seq(" ", "  ", "\t", " \n ", "   ")
    val docs = (0L until 120L).map { i =>
      val n = 1 + rnd.nextInt(60)
      val pad = if (rnd.nextBoolean()) "  " else ""
      val body = (1 to n).map(k => s"t${i}_$k")
        .reduce((a, b) => a + seps(rnd.nextInt(seps.size)) + b)
      (i, pad + body + (if (rnd.nextBoolean()) "\n" else ""))
    }
    val byDoc = operators.Pipeline.chunkText(docs.toDF("doc_id", "text"),
      "doc_id", "text", chunkW, overlap)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getLong(6)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    docs.foreach { case (id, text) =>
      val wordsSeq = text.split("\\s+").filter(_.nonEmpty).toSeq
      val n = wordsSeq.length
      val chunks = byDoc(id)
      // count formula
      val expected = 1 + math.max(0,
        math.ceil((n - chunkW).toDouble / stride).toInt)
      assert(chunks.length == expected, s"doc $id: chunk count")
      chunks.foreach { case (_, c, start, len, body, sc, ec) =>
        assert(start == c.toLong * stride)
        assert(len >= 1 && len <= chunkW)
        // chunk text is exactly the claimed word window
        assert(body.split(" ").toSeq ==
          wordsSeq.slice(start.toInt, start.toInt + len.toInt),
          s"doc $id chunk $c window")
        // the char span cites the ORIGINAL document: substring at the
        // 1-based inclusive span re-tokenizes to the chunk's words
        // (these docs are ASCII, so java substring == code points)
        val cited = text.substring(sc.toInt - 1, ec.toInt)
        assert(cited.split("\\s+").filter(_.nonEmpty).toSeq ==
          body.split(" ").toSeq, s"doc $id chunk $c span")
        // and the span is tight: no whitespace at either edge
        assert(!cited.head.isWhitespace && !cited.last.isWhitespace,
          s"doc $id chunk $c span edges")
      }
      // consecutive chunks overlap in chars exactly when they overlap
      // in words: chunk c+1 starts stride words in, so its start_char
      // is strictly inside (or after) chunk c's span for overlap > 0
      chunks.sliding(2).foreach {
        case Seq((_, _, _, _, _, _, ec1), (_, _, _, len2, _, sc2, _)) =>
          if (len2 > overlap) assert(sc2 <= ec1, s"doc $id: overlap chars")
        case _ =>
      }
      // full coverage in order: stitching non-overlap prefixes + the
      // final chunk reconstructs the word sequence exactly
      val stitched = chunks.dropRight(1).flatMap { case (_, _, st, _, b, _, _) =>
        b.split(" ").take(stride) } ++
        chunks.last._5.split(" ")
      assert(stitched == wordsSeq, s"doc $id: coverage")
    }
  }

  test("stratifiedSplit: randomized invariants — exact floors, rank permutation") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val strata = ('a' to 'f').map(_.toString)
    val rows = strata.flatMap { s =>
      val n = 1 + rnd.nextInt(60)
      (1 to n).map(i => (s"$s$i", s))
    }
    val (ft, fv) = (0.7, 0.15)
    val got = operators.Pipeline.stratifiedSplit(
      rows.toDF("id", "strat"), "id", "strat", ft, fv)
      .collect()
      .map(r => (r.getString(1), r.getString(0), r.getLong(2), r.getString(3)))
    got.groupBy(_._1).foreach { case (s, g) =>
      val n = rows.count(_._2 == s)
      assert(g.length == n, s"stratum $s: row count")
      // rk is a permutation of 1..n
      assert(g.map(_._3).sorted.toSeq == (1L to n).toSeq, s"stratum $s: rk")
      // exact floor counts per split
      val bySplit = g.groupBy(_._4).view.mapValues(_.length).toMap
      val (tN, vN) = (math.floor(ft * n).toLong, math.floor(fv * n).toLong)
      assert(bySplit.getOrElse("train", 0) == tN, s"stratum $s: train")
      assert(bySplit.getOrElse("val", 0) == vN, s"stratum $s: val")
      assert(bySplit.getOrElse("test", 0) == n - tN - vN, s"stratum $s: test")
      // split boundaries follow the rank order (train = lowest ranks)
      g.sortBy(_._3).map(_._4).foldLeft("train") { (prev, cur) =>
        assert(Seq("train", "val", "test").indexOf(cur) >=
          Seq("train", "val", "test").indexOf(prev), s"stratum $s: order")
        cur
      }
    }
  }

  test("recallAtK: per-query hit counting, identity recall 1.0, alien columns") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L)).toDF("q_id", "vec_id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 99L),
      (2L, 77L), (2L, 78L), (2L, 79L)).toDF("q_id", "vec_id")
    val got = Pipeline.recallAtK(approx, exact).orderBy("q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 3L, 2L, 2.0 / 3), (2L, 3L, 0L, 0.0)))
    // identity: a result set scored against itself is exactly 1.0
    val self = Pipeline.recallAtK(exact, exact).select("recall").collect()
    assert(self.nonEmpty && self.forall(_.getDouble(0) == 1.0))
    // approx-only (q, id) rows are ignored: recall counts exact rows
    val extra = approx.union(Seq((3L, 1L)).toDF("q_id", "vec_id"))
    assert(Pipeline.recallAtK(extra, exact).count() == 2)
    // duplicate (q, id) rows on either side must not fan out the join
    // and inflate n_exact/n_hits (ADVICE r10): a doubled approx table
    // scores identically to the original
    val dupped = Pipeline.recallAtK(approx.union(approx), exact.union(exact))
      .orderBy("q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(dupped.toSeq == got.toSeq)
    // alien column names normalize to the documented output shape
    val alien = Pipeline.recallAtK(
      approx.toDF("qq", "ii"), exact.toDF("qq", "ii"),
      qCol = "qq", idCol = "ii")
    assert(alien.columns.toSeq == Seq("q_id", "n_exact", "n_hits", "recall"))
  }

  test("packSequences: offsets are a gapless global prefix sum; alien columns") {
    import spark.implicits._
    val rows = Seq(
      (1L, "sA", 100L), (2L, "sA", 200L), (3L, "sB", 300L), (4L, "sB", 50L))
      .toDF("rid", "shard", "ntok")
    val out = Pipeline.packSequences(rows, "rid", "shard", col("ntok"),
      contextLen = 128).orderBy("tok_offset").collect()
    val offs = out.map(r => (r.getLong(0), r.getLong(r.fieldIndex("tok_offset")),
      r.getLong(r.fieldIndex("n_chunks"))))
    // shard sA packs first (base 0), then sB at base 300
    assert(offs.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 0L), (2L, 100L), (3L, 300L), (4L, 600L)))
    // doc 2 spans tokens 100..299 → chunks 0..2 of 128 → 3 chunks
    assert(offs.find(_._1 == 2L).get._3 == 3L)
    // the shard-size advisory raises LOUDLY when one shard exceeds
    // maxShardRows (sequential packing = ONE window task per shard; an
    // oversized shard is a silent straggler at 100 TB otherwise), and
    // the message carries the sizing math
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception](
      Pipeline.packSequences(rows, "rid", "shard", col("ntok"),
        contextLen = 128, maxShardRows = 1L).collect())
    assert(msgs(e).exists(m => m.contains("maxShardRows")
      && m.contains("corpus_rows / |shards|")), s"got ${msgs(e)}")
    val e2 = intercept[Exception](
      Pipeline.packTokenIds(
        Seq((1L, "sA", Seq(1, 2)), (2L, "sA", Seq(3))).toDF("rid", "shard", "ids"),
        "rid", "shard", "ids", contextLen = 4, sepId = -1,
        maxShardRows = 1L).collect())
    assert(msgs(e2).exists(_.contains("maxShardRows")), s"got ${msgs(e2)}")
  }

  test("passageShareStats: verbatim copies score 1.0, one copied block scores 1/51") {
    val stats = Pipeline.passageShareStats(corpus, "post_key", "body")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(stats(14L) == 1.0 && stats(15L) == 1.0) // verbatim copies
    // the copied v21..v30 block is EXACTLY one 10-gram of each doc's 51
    assert(stats(12L) == 1.0 / 51 && stats(13L) == 1.0 / 51)
    // the 1-word edit breaks 10 of A/B's 51 passages, shares the rest
    assert(stats(10L) == 41.0 / 51 && stats(11L) == 41.0 / 51)
  }

  test("hardNegativeMine: excludes self and labeled positives, ranks by " +
      "cosine desc, honors k; positives column names are free") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)), (3L, Array(3f, 1f)),
      (4L, Array(0f, 1f)), (5L, Array(-1f, 0f)))
      .toDF("post_key", "v")
    val queries = vecs.filter($"post_key" === 1L)
    // alien column names on the positives relation: first = query id,
    // second = positive id
    val pos = Seq((1L, 2L)).toDF("qq", "pp")
    val out = Pipeline.hardNegativeMine(vecs, queries, pos,
      "post_key", "v", k = 2)
      .orderBy("q_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // candidates: 3 (cos 3/√10), 4 (cos 0), 5 (cos −1); self 1 and
    // positive 2 excluded; k = 2 keeps 3 then 4
    assert(out.map(t => (t._1, t._2, t._4)).toSeq ==
      Seq((1L, 3L, 1), (1L, 4L, 2)), out.mkString(", "))
    assert(out(0)._3 == 3.0 / (math.sqrt(1.0) * math.sqrt(10.0)))
    assert(out(1)._3 == 0.0)
    // k beyond the surviving pool returns just the pool
    val all = Pipeline.hardNegativeMine(vecs, queries, pos,
      "post_key", "v", k = 10).collect()
    assert(all.length == 3)
  }

  test("randomProject: deterministic ±1/√m projection — zero maps to " +
      "zero, linear on exactly-representable inputs, float output") {
    import spark.implicits._
    val vs = Seq(
      (1L, Array(1f, 0f, 0f, 2f)), (2L, Array(2f, 0f, 0f, 4f)),
      (3L, Array(0f, 0f, 0f, 0f)))
      .toDF("post_key", "v")
    def proj() = Pipeline.randomProject(vs, "v", dim = 4, outDim = 4)
      .select($"post_key", $"projected").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val out = proj()
    assert(out(1L).length == 4)
    assert(out(3L).forall(_ == 0f))
    // ±1 weights hit dims 1 and 4 only (zeros elsewhere): each y_j is
    // (±1 ± 2)/√4 — small dyadic values, exact in float — so doubling
    // the input doubles every coordinate exactly
    assert(out(2L) == out(1L).map(x => x * 2))
    assert(out(1L).forall(y => Set(0.5f, 1.5f).contains(math.abs(y))),
      out(1L).mkString(", "))
    // no RNG anywhere: a second invocation reproduces bit-identically
    assert(proj() == out)
  }

  test("minhashBandPlan: matches an independent integrator's argmin; " +
      "sharper curves at higher thresholds; bounds enforced") {
    // independent reference: trapezoidal rule at 4× the resolution —
    // different integrator, same objective; the chosen plan's objective
    // must match the reference argmin's to well under any plan gap
    def admit(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    def objRef(t: Double, b: Int, r: Int): Double = {
      val g = 4000
      def trap(lo: Double, hi: Double, f: Double => Double): Double = {
        val h = (hi - lo) / g
        (0 until g).map(i => (f(lo + i * h) + f(lo + (i + 1) * h)) / 2 * h).sum
      }
      0.5 * trap(0, t, s => admit(s, b, r)) +
        0.5 * trap(t, 1, s => 1 - admit(s, b, r))
    }
    for ((t, n) <- Seq((0.2, 32), (0.5, 32), (0.8, 32), (0.5, 128),
        (0.9, 64))) {
      val (b, r) = Pipeline.minhashBandPlan(t, n)
      assert(b >= 1 && r >= 1 && b * r <= n, s"($b, $r) out of budget $n")
      val ref = (1 to n).map(bb => (bb, n / bb)).filter(_._2 >= 1)
        .minBy { case (bb, rr) => objRef(t, bb, rr) }
      assert(math.abs(objRef(t, b, r) - objRef(t, ref._1, ref._2)) < 1e-6,
        s"planner ($b,$r) vs reference $ref at t=$t n=$n")
    }
    // a high-threshold target wants a sharper S-curve: r must not shrink
    assert(Pipeline.minhashBandPlan(0.2, 32)._2 <=
      Pipeline.minhashBandPlan(0.9, 32)._2)
    intercept[IllegalArgumentException] { Pipeline.minhashBandPlan(0.0) }
    intercept[IllegalArgumentException] { Pipeline.minhashBandPlan(1.0) }
    intercept[IllegalArgumentException] {
      Pipeline.minhashBandPlan(0.5, 32, 0.0, 0.0)
    }
  }

  test("minhashNeardupPairs: custom banding keeps exact-dup recall and " +
      "exact verification") {
    // identical texts share every signature slot, so the exact pair
    // (14, 15) must surface under ANY banding; verification stays the
    // exact Jaccard regardless of the LSH split
    for ((b, r) <- Seq((16, 2), (4, 8),
        Pipeline.minhashBandPlan(0.5, 32))) {
      val pairs = Pipeline.minhashNeardupPairs(corpus, "post_key", "body",
        bands = b, rows = r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      assert(pairs.exists(p => p._1 == 14L && p._2 == 15L && p._3 == 1.0),
        s"exact dup missed at ($b, $r)")
      assert(pairs.forall(p => p._3 >= 0.5 && p._3 <= 1.0))
    }
    intercept[IllegalArgumentException] {
      Pipeline.minhashNeardupPairs(corpus, "post_key", "body",
        bands = 0, rows = 4)
    }
  }

  test("dataCard: totals, strata, histogram and quality counters on a " +
      "hand-checkable corpus; strata optional") {
    import spark.implicits._
    val big = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, "a b c", "en", "s1"),
      (2L, "a b c", "de", "s1"),              // exact dup of doc 1
      (3L, null.asInstanceOf[String], "en", "s2"),
      (4L, "   ", "de", "s2"),                // blank: 0 tokens, 3 chars
      (5L, big, "en", "s1"))
      .toDF("post_key", "body", "tongue", "origin")
    val card = Pipeline.dataCard(docs, "post_key", "body",
      strataCols = Seq("tongue", "origin"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[java.lang.Long]("n_docs"),
        r.getAs[java.lang.Long]("n_tokens"),
        r.getAs[java.lang.Long]("n_chars")))
    def row(s: String, k: String) = card.find(x => x._1 == s && x._2 == k).get
    assert(row("corpus", "all") == (("corpus", "all", 5L, 46L,
      5L + 5L + 0L + 3L + big.length)))
    assert(row("by_tongue", "en")._3 == 3L && row("by_tongue", "de")._3 == 2L)
    assert(row("by_origin", "s1") == (("by_origin", "s1", 3L, 46L,
      5L + 5L + big.length)))
    assert(row("tokens_bucket", "0")._3 == 2L)      // NULL + blank
    assert(row("tokens_bucket", "1-32")._3 == 2L)
    assert(row("tokens_bucket", "33-64") == (("tokens_bucket", "33-64",
      1L, 40L, big.length.toLong)))
    assert(row("quality", "null_text") == (("quality", "null_text",
      1L, null, null)))
    assert(row("quality", "blank_text")._3 == 1L)
    assert(row("quality", "exact_dup_docs")._3 == 1L)
    // no strata requested → only the stratum-free sections appear
    val plain = Pipeline.dataCard(docs, "post_key", "body")
      .select("section").distinct().collect().map(_.getString(0)).sorted
    assert(plain.toSeq == Seq("corpus", "quality", "tokens_bucket"))
  }

  test("bm25Postings: weights match the hand-replayed Okapi formula; " +
      "idf orders rare above common; retrieval composes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"),                     // dl 3
      (2L, "a c"),                       // dl 2
      (3L, "c c c a"),                   // dl 4
      (4L, null.asInstanceOf[String]),   // contributes nothing
      (5L, "   "))                       // zero tokens: dropped
      .toDF("post_key", "body")
    val posts = Pipeline.bm25Postings(docs, "post_key", "body")
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // N = 3 docs, avgdl = 9/3; replay the exact arithmetic (same op
    // order, same HALF_UP round-9) for every posting
    val n = 3.0
    val avgdl = 9.0 / 3.0
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def w(tf: Double, dl: Double, df: Double): Double = {
      val idf = r9(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
      r9(idf * (tf * (1.2 + 1.0) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))))
    }
    assert(posts.size == 6)
    assert(posts((1L, "a")) == ((2L, 3L, 3L, w(2, 3, 3))))
    assert(posts((1L, "b")) == ((1L, 3L, 1L, w(1, 3, 1))))
    assert(posts((2L, "a")) == ((1L, 2L, 3L, w(1, 2, 3))))
    assert(posts((2L, "c")) == ((1L, 2L, 2L, w(1, 2, 2))))
    assert(posts((3L, "c")) == ((3L, 4L, 2L, w(3, 4, 2))))
    assert(posts((3L, "a")) == ((1L, 4L, 3L, w(1, 4, 3))))
    // the Lucene idf is always positive, and rarer terms outweigh
    // common ones at equal tf/dl: b (df 1) > c (df 2) > a (df 3) in doc-
    // normalized weight
    assert(posts.values.forall(_._4 > 0))
    assert(w(1, 3, 1) > w(1, 3, 2) && w(1, 3, 2) > w(1, 3, 3))
    // composition: doc 2 queries with weight 1 per term → doc 3 wins
    // (shares rare c AND a) over doc 1 (shares only a)
    val q = Seq((2L, "a", 1.0), (2L, "c", 1.0))
      .toDF("doc_id", "term", "weight")
    val top = Pipeline.sparseTopK(
      Pipeline.bm25Postings(docs, "post_key", "body")
        .select(col("doc_id"), col("term"), col("weight")), q, k = 2)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(top.toSeq == Seq((3L, 1), (1L, 2)))
    intercept[IllegalArgumentException] {
      Pipeline.bm25Postings(docs, "post_key", "body", b = 1.5)
    }
  }

  test("tokenizerStats: fertility, compression and UNK rate on a " +
      "hand-checkable segmentation; unkCol optional") {
    import spark.implicits._
    val segs = Seq(
      // (word, n_pieces, is_unk, lang)
      ("table", 1L, false, "en"),
      ("stream", 2L, false, "en"),
      ("spark", 1L, true, "en"),
      ("data", 2L, false, "de"))
      .toDF("word", "n_pieces", "is_unk", "lang")
    val got = Pipeline.tokenizerStats(segs, byCols = Seq("lang"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got.toSeq == Seq(
      ("de", 1L, 2L, 4L, 0L, 2.0, 2.0, 0.0),
      ("en", 3L, 4L, 16L, 1L, 4.0 / 3.0, 16.0 / 4.0, 1.0 / 3.0)))
    // without an UNK column the report drops the rate, keeps the rest
    val plain = Pipeline.tokenizerStats(segs.drop("is_unk"),
      byCols = Seq("lang"), unkCol = None)
    assert(!plain.columns.contains("unk_rate") &&
      plain.columns.contains("fertility"))
  }

  test("collocations: word2phrase scores by hand; discount and " +
      "minCount behave; ties break on the pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "new york new york new york new york new york"),
      (2L, "the the the the the the"))
      .toDF("post_key", "body")
    // counts: new=5, york=5, the=6; bigrams (new,york)=5, (york,new)=4,
    // (the,the)=5
    val byPair = Pipeline.collocations(docs, "body", k = 10, minCount = 3,
      delta = 1.0).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        (r.getAs[Long]("c_ab"), r.getAs[Long]("c_a"), r.getAs[Long]("c_b"),
          r.getAs[Double]("score"))))
    assert(byPair.map(_._1).toSeq == Seq(("new", "york"), ("york", "new"),
      ("the", "the")))                         // 0.16 > 0.12 > 4/36
    assert(byPair.toMap.apply(("new", "york")) ==
      ((5L, 5L, 5L, (5.0 - 1.0) / (5.0 * 5.0))))
    assert(byPair.toMap.apply(("the", "the")) ==
      ((5L, 6L, 6L, (5.0 - 1.0) / (6.0 * 6.0))))
    // minCount drops (york,new); δ = count zeroes both survivors →
    // score tie broken by pair order
    val tied = Pipeline.collocations(docs, "body", k = 10, minCount = 5,
      delta = 5.0).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Double]("score")))
    assert(tied.toSeq == Seq(("new", "york", 0.0), ("the", "the", 0.0)))
    intercept[IllegalArgumentException] {
      Pipeline.collocations(docs, "body", k = 0)
    }
  }

  test("frequencySubsample: rare words always survive, frequent words " +
      "thin to ~sqrt(t/f), keep_p replays the formula, deterministic") {
    import spark.implicits._
    val docs = (1 to 10).map(i =>
      (i.toLong, (Seq.fill(10)("a") ++ (if (i == 1) Seq("z") else Nil))
        .mkString(" ")))
      .toDF("post_key", "body")
    // 100 'a' + 1 'z'; t = 0.05: f_z < t → rare, stays out of the
    // threshold-bounded table → keep_p = 1.0, always kept;
    // f_a = 100/101 → keep_p = sqrt(0.0505) ≈ 0.22
    def run() = Pipeline.frequencySubsample(docs, "post_key", "body",
      t = 0.05).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val kept = run()
    assert(kept.sameElements(run()))           // RNG-free: rerun-identical
    assert(kept.exists(_._3 == "z"), "rare word must always survive")
    val aKept = kept.count(_._3 == "a")
    assert(aKept > 0 && aKept < 100, s"expected genuine thinning, got $aKept")
    val expA = math.sqrt(0.05 / (100.0 / 101.0))
    kept.foreach { case (_, _, w, p) =>
      assert(p == (if (w == "a") expA else 1.0))
    }
    intercept[IllegalArgumentException] {
      Pipeline.frequencySubsample(docs, "post_key", "body", t = 0.0)
    }
  }

  test("hllSketch/hllMerge/hllEstimate: registers replay the md5 rank " +
      "by hand, duplicates are free, merge == sketch of the union, " +
      "estimate is the exact harmonic formula") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma delta")).toDF("post_key", "body")
    val dup = Seq((1L, "alpha beta gamma delta"),
      (2L, "alpha alpha beta gamma delta")).toDF("post_key", "body")
    def regs(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect()(0).getSeq[Long](0)
    val ra = regs(Pipeline.hllSketch(a, "body"))
    // max is idempotent: re-occurrences never move a register
    assert(ra == regs(Pipeline.hllSketch(dup, "body")))
    assert(ra.length == 64 && ra.count(_ > 0) >= 1 && ra.count(_ > 0) <= 4)
    // hand-replay the md5-derived (bucket, rank) of each word
    def reg(w: String): (Int, Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(6)
        .map(b => f"${b & 0xff}%02x").mkString
      val h = java.lang.Long.parseLong(hex, 16)
      val p = h >> 6
      ((h & 63).toInt,
        if (p == 0) 43L else 43L - java.lang.Long.toBinaryString(p).length)
    }
    val exp = Array.fill(64)(0L)
    Seq("alpha", "beta", "gamma", "delta").foreach { w =>
      val (b, r) = reg(w); exp(b) = math.max(exp(b), r)
    }
    assert(ra == exp.toSeq)
    // merging per-shard sketches is lossless: register-wise max
    val b2 = Seq((3L, "epsilon zeta")).toDF("post_key", "body")
    val merged = regs(Pipeline.hllMerge(
      Pipeline.hllSketch(a, "body").unionAll(Pipeline.hllSketch(b2, "body"))))
    assert(merged == regs(Pipeline.hllSketch(a.unionAll(b2), "body")))
    // the raw estimate is the exact (order-free) harmonic formula
    val est = Pipeline.hllEstimate(Pipeline.hllSketch(a, "body")).collect()(0)
    val hsum = ra.foldLeft(0.0)((acc, r) => acc + 1.0 / (1L << r).toDouble)
    val alpha = 0.7213 / (1.0 + 1.079 / 64)
    assert(est.getAs[Long]("hll_v0") == ra.count(_ == 0).toLong)
    assert(est.getAs[Double]("hll_hsum") == hsum)
    assert(est.getAs[Double]("hll_raw_est") == alpha * 64.0 * 64.0 / hsum)
    intercept[IllegalArgumentException](Pipeline.hllSketch(a, "body", b = 0))
  }

  test("skipgramPairs: md5-derived 1..w windows, edge clipping, " +
      "contexts match positions; NULL text contributes nothing") {
    import spark.implicits._
    val docs = Seq((7L, "a b c d e"), (8L, null.asInstanceOf[String]))
      .toDF("post_key", "body")
    val got = Pipeline.skipgramPairs(docs, "post_key", "body", window = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toSet
    def winOf(doc: Long, pos: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$doc:$pos".getBytes("UTF-8")).take(6)
        .map(b => f"${b & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % 2) + 1
    }
    val ws = Array("a", "b", "c", "d", "e")
    val exp = (0 until 5).flatMap { i =>
      val b = winOf(7L, i.toLong)
      ((-b to -1L) ++ (1L to b)).map(i + _).filter(j => j >= 0 && j < 5)
        .map(j => (7L, i.toLong, ws(i), j, ws(j.toInt), b))
    }.toSet
    assert(got == exp)
    assert(exp.map(_._6).exists(_ == 1L) || exp.map(_._6).exists(_ == 2L))
    intercept[IllegalArgumentException] {
      Pipeline.skipgramPairs(docs, "post_key", "body", window = 0)
    }
  }

  test("phraseBlocklistFilter: contiguous whole-word runs only, " +
      "case-insensitive, mixed lengths OR together, NULL never blocks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),   // 3-gram hit
      (2L, "a quick brown wolf"),          // 1-gram hit (case-folded)
      (3L, "quick red brown fox"),         // gap breaks the run
      (4L, "the breakfast foxtrot"),       // substrings never match
      (5L, null.asInstanceOf[String]))
      .toDF("post_key", "body")
    val got = Pipeline.phraseBlocklistFilter(docs, "body",
      Seq("quick brown fox", "Wolf"))
      .select(col("post_key"), col("blocked")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      5L -> false))
    // case-sensitive mode: "Wolf" no longer matches lowercase "wolf"
    val cs = Pipeline.phraseBlocklistFilter(docs, "body",
      Seq("quick brown fox", "Wolf"), caseInsensitive = false)
      .select(col("post_key"), col("blocked")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(cs == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> false))
    intercept[IllegalArgumentException] {
      Pipeline.phraseBlocklistFilter(docs, "body", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Pipeline.phraseBlocklistFilter(docs, "body", Seq("   "))
    }
  }

  test("knBigramModel: hand-computed probabilities, and P_KN is a " +
      "proper distribution — per-context sums over the FULL vocab " +
      "(seen mass + lambda-weighted unseen mass) are 1") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c")).toDF("post_key", "body")
    val rows = Pipeline.knBigramModel(docs, "body").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    // bigrams: (a,b)=2, (b,a)=1, (b,c)=1; ctx a: (2,1), b: (2,2);
    // cont: a=1, b=1, c=1; N1+(..)=3
    assert(rows(("a", "b")) ==
      ((2L, 2L, 1L, 1L, 1.0 / 3, 0.75 * 1 / 2, (2.0 - 0.75) / 2 +
        (0.75 * 1 / 2) * (1.0 / 3))))
    assert(rows(("b", "a"))._7 == (1.0 - 0.75) / 2 + (0.75 * 2 / 2) * (1.0 / 3))
    assert(rows(("b", "c"))._7 == rows(("b", "a"))._7)
    // normalization: for each context, seen p_kn + unseen lambda·p_cont
    // over the whole vocabulary sums to 1
    val vocab = Seq("a", "b", "c")
    val pCont = rows.map { case ((_, b), v) => b -> v._5 }
    val lambda = rows.map { case ((a, _), v) => a -> v._6 }
    for (a <- Seq("a", "b")) {
      val total = vocab.map { b =>
        rows.get((a, b)).map(_._7).getOrElse(lambda(a) * pCont(b))
      }.sum
      assert(math.abs(total - 1.0) < 1e-12, s"context $a sums to $total")
    }
    intercept[IllegalArgumentException] {
      Pipeline.knBigramModel(docs, "body", discount = 1.0)
    }
  }

  test("ngramNoveltyScore: exact shares by hand — verbatim copy 0, " +
      "disjoint 1, partial overlap fractional, sub-n and NULL NULL") {
    import spark.implicits._
    val ref = Seq((100L, "a b c d e")).toDF("post_key", "body")
    val docs = Seq(
      (1L, "a b c d e"),      // every 3-gram known → novelty 0
      (2L, "x y z w"),        // disjoint → novelty 1
      (3L, "a b c x y"),      // abc known; bcx, cxy new → 2/3
      (4L, "q r"),            // shorter than n → 0 grams, NULL novelty
      (5L, null.asInstanceOf[String]))
      .toDF("post_key", "body")
    val got = Pipeline.ngramNoveltyScore(docs, ref, "body", n = 3)
      .select(col("post_key"), col("n_grams"), col("n_known"),
        col("novelty")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L) == ((3L, 3L, Some(0.0))))
    assert(got(2L) == ((2L, 0L, Some(1.0))))
    assert(got(3L) == ((3L, 1L, Some(2.0 / 3))))
    assert(got(4L) == ((0L, 0L, None)))
    assert(got(5L) == ((0L, 0L, None)))
  }

  test("cdcChunks: chunks partition the word sequence, boundaries are " +
      "content-defined (insertion re-syncs), edge docs behave") {
    import spark.implicits._
    val vocab = "abcdefghijklmnopqrstuvw".map(_.toString)
    val base = (0 until 200).map(i => vocab((i * 7 + i * i) % vocab.length))
    val shifted = "zzz" +: base
    val docs = Seq(
      (1L, base.mkString(" ")),
      (2L, shifted.mkString(" ")),
      (3L, "lonely"),
      (4L, null.asInstanceOf[String]))
      .toDF("post_key", "body")
    val got = Pipeline.cdcChunks(docs, "post_key", "body").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val byDoc = got.groupBy(_._1).map { case (d, cs) =>
      d -> cs.sortBy(_._2)
    }
    // partition property: chunk_no consecutive from 0, spans contiguous
    // and covering 1..n
    for ((d, n) <- Seq(1L -> 200, 2L -> 201, 3L -> 1)) {
      val cs = byDoc(d)
      assert(cs.map(_._2).toSeq == cs.indices.map(_.toLong))
      assert(cs.head._3 == 1L)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4)
        case _ =>
      }
      assert(cs.last._3 + cs.last._4 - 1 == n)
    }
    assert(!byDoc.contains(4L))
    assert(byDoc(3L).length == 1)   // shorter than k: one whole chunk
    // content-defined re-sync: prepending one word shifts every offset
    // but the chunk streams re-align — the TAIL chunks hash identically
    val h1 = byDoc(1L).map(_._5)
    val h2 = byDoc(2L).map(_._5)
    assert(h1.length > 3, s"fixture should cut several chunks, got ${h1.length}")
    val common = h1.reverse.zip(h2.reverse).takeWhile { case (a, b) => a == b }
    assert(common.length >= h1.length / 2,
      s"expected tail re-sync, shared tail = ${common.length} of ${h1.length}")
  }

  test("cdcChunks: property — chunks partition every random document " +
      "contiguously and re-concatenate to the original words") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docGen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))
    val gen = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, docGen))
    val p = Prop.forAll(gen) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("post_key", "body")
      val got = Pipeline.cdcChunks(df, "post_key", "body", k = 2,
        divisor = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      docs.zipWithIndex.forall { case (ws, i) =>
        val cs = got.getOrElse(i.toLong, Array.empty).sortBy(_._2)
        cs.map(_._2).toSeq == cs.indices.map(_.toLong) &&
          cs.head._3 == 1L &&
          cs.sliding(2).forall {
            case Array(a, b) => b._3 == a._3 + a._4
            case _ => true
          } &&
          cs.last._3 + cs.last._4 - 1 == ws.length.toLong
      }
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(6), p)
    assert(r.passed, r.status.toString)
  }

  test("corpusDrift: property — TVD is symmetric and in [0,1] on " +
      "random slice pairs; identical slices score 0") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docGen = Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" ")))
    val gen = for {
      a <- Gen.nonEmptyListOf(docGen); b <- Gen.nonEmptyListOf(docGen)
    } yield (a.take(4), b.take(4))
    def df(docs: Seq[String]) = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("post_key", "body")
    def tvd(a: Seq[String], b: Seq[String]): Double =
      Pipeline.corpusDrift(df(a), df(b), "body", k = 50)
        .collect()(0).getAs[Double]("tvd")
    val p = Prop.forAll(gen) { case (a, b) =>
      val t = tvd(a, b)
      t >= 0.0 && t <= 1.0 && t == tvd(b, a)
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(5), p)
    assert(r.passed, r.status.toString)
    val same = Seq("x y z x")
    assert(tvd(same, same) == 0.0)
  }

  test("cdcDedupReport: duplicated chunks aggregate exactly from the " +
      "chunk stream; identical docs save all their words") {
    import spark.implicits._
    val vocab = "abcdefghijklmnopqrstuvw".map(_.toString)
    val base = (0 until 200).map(i => vocab((i * 7 + i * i) % vocab.length))
      .mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, "entirely different words"))
      .toDF("post_key", "body")
    val chunks = Pipeline.cdcChunks(docs, "post_key", "body").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    val expected = chunks.groupBy(_._3).collect {
      case (h, cs) if cs.length >= 2 =>
        h -> ((cs.length.toLong, cs.map(_._2).min,
          (cs.length - 1).toLong * cs.map(_._2).min, cs.map(_._1).min))
    }
    val got = Pipeline.cdcDedupReport(docs, "post_key", "body").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.forall(_._1 >= 2L))
    // the identical pair duplicates every chunk: savings cover at
    // least one full copy of the 200-word doc
    assert(got.values.map(_._3).sum >= 200L)
    assert(got.values.forall(_._4 == 1L))   // first holder is doc 1
  }

  test("minhashAccuracyReport: identical docs estimate 1.0 with zero " +
      "error, est is exactly n_agree/n, mae replays the decimal mean") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base),                       // exact pair: J = 1
      (3L, base + " lambda mu"), (4L, "unrelated words entirely here now"))
      .toDF("post_key", "body")
    val got = Pipeline.minhashAccuracyReport(docs, "post_key", "body")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))))
    assert(got.nonEmpty)
    val m = got.toMap
    assert(m.contains((1L, 2L)))
    assert(m((1L, 2L)) == ((32L, 1.0, 1.0, 0.0, m((1L, 2L))._5)))
    got.foreach { case (_, (nAgree, est, jac, absErr, _)) =>
      assert(est == nAgree.toDouble / 32)
      assert(jac >= 0.0 && jac <= 1.0)
      assert(absErr == math.abs(est - jac))
    }
    // mae == the decimal-averaged abs_err (the davg path by hand)
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val errs = got.map(_._2._4)
    val expMae = errs.map(BigDecimal(_).setScale(10, HALF_UP)).sum
      .setScale(4, HALF_UP).toDouble / errs.length
    assert(got.forall(_._2._5 == expMae))
  }

  test("editDistanceNeardupPairs: exact Levenshtein on candidates, " +
      "identical docs score 1.0, minSim filters, codepoint semantics") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val edited = base.replace("kappa", "kappo")
    val docs = Seq((1L, base), (2L, base), (3L, edited))
      .toDF("post_key", "body")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val texts = Map(1L -> base, 2L -> base, 3L -> edited)
    val got = Pipeline.editDistanceNeardupPairs(docs, "post_key", "body",
      minSim = 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.contains((1L, 2L)))
    assert(got((1L, 2L)) == ((0L, base.length.toLong, base.length.toLong, 1.0)))
    got.foreach { case ((a, b), (dist, la, lb, sim)) =>
      assert(dist == lev(texts(a), texts(b)).toLong)
      assert(la == texts(a).length.toLong && lb == texts(b).length.toLong)
      assert(sim == 1.0 - dist.toDouble / math.max(la, lb).toDouble)
    }
    // tight threshold keeps only the exact pair
    val tight = Pipeline.editDistanceNeardupPairs(docs, "post_key", "body",
      minSim = 0.999).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tight.toSet == Set((1L, 2L)))
    // Spark's levenshtein counts codepoints (the documented DuckDB
    // byte-count divergence is oracle-side only; gate corpus is ASCII)
    import org.apache.spark.sql.functions.{levenshtein => slev, lit => slit}
    assert(spark.range(1).select(slev(slit("héllo"), slit("hello")))
      .collect()(0).getInt(0) == 1)
  }

  test("charEntropySignal: hand-replayed entropy through the " +
      "round-ln + decimal path; uniform text scores 0; empty/NULL " +
      "texts carry no row") {
    import spark.implicits._
    val docs = Seq((1L, "aab"), (2L, "aaaa"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("post_key", "body")
    val got = Pipeline.charEntropySignal(docs, "post_key", "body")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, HALF_UP).toDouble
    def dsum(xs: Seq[Double]): Double =
      xs.map(BigDecimal(_).setScale(10, HALF_UP)).sum
        .setScale(4, HALF_UP).toDouble
    val exp = -dsum(Seq(
      (2.0 / 3) * r9(math.log(2.0 / 3)),
      (1.0 / 3) * r9(math.log(1.0 / 3))))
    assert(got == Map(1L -> ((3L, exp)), 2L -> ((4L, -0.0))))
    assert(got(2L)._2 == 0.0)   // -0.0 == 0.0 numerically
  }

  test("vocabGrowth: first-seen words land in their id slice, " +
      "cumulative vocabulary is monotone, slice bounds are exact") {
    import spark.implicits._
    val docs = ((0L to 9L).map(i => (i, i match {
      case 0L => "x y"
      case 5L => "y z"
      case 7L => "x w"
      case _ => null.asInstanceOf[String]
    }))).toDF("post_key", "body")
    val got = Pipeline.vocabGrowth(docs, "post_key", "body", buckets = 2)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // slice 0 = ids 0..4 (x, y first appear), slice 1 = ids 5..9 (z, w)
    assert(got.toSeq == Seq(
      (0, 0L, 4L, 5L, 2L, 2L, 2L),
      (1, 5L, 9L, 5L, 4L, 2L, 4L)))
    intercept[IllegalArgumentException] {
      Pipeline.vocabGrowth(docs, "post_key", "body", buckets = 0)
    }
  }

  test("corpusDrift: TVD and per-word contributions by hand — a word " +
      "absent from one side still contributes, order is |p-q| desc") {
    import spark.implicits._
    val a = Seq((1L, "x x y")).toDF("post_key", "body")
    val b = Seq((2L, "x z")).toDF("post_key", "body")
    val got = Pipeline.corpusDrift(a, b, "body", k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val byDiff = got.sortBy(x => (-x._6, x._1))
    assert(byDiff.map(_._1).toSeq == Seq("z", "y", "x"))
    val m = got.map(r => r._1 -> r).toMap
    assert(m("x") == (("x", 2L, 1L, 2.0 / 3, 1.0 / 2,
      math.abs(2.0 / 3 - 1.0 / 2), 0.5)))
    assert(m("z") == (("z", 0L, 1L, 0.0, 0.5, 0.5, 0.5)))
    assert(got.forall(_._7 == 0.5))   // TVD = 1/2 (1/6 + 1/3 + 1/2)
    intercept[IllegalArgumentException] {
      Pipeline.corpusDrift(a, b, "body", k = 0)
    }
  }

  test("textrankKeywords: two hand-replayed PageRank rounds on a path " +
      "graph — hub outranks leaves, decimal requantization matches, " +
      "ties break on word") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("post_key", "body")
    val got = Pipeline.textrankKeywords(docs, "body", window = 1,
      iters = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    // replay the dsum path: per-element double -> DECIMAL(38,10)
    // HALF_UP, exact sum, DECIMAL(27,4) HALF_UP, back to double
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    def qsum(xs: Seq[Double]): Double =
      xs.map(BigDecimal(_).setScale(10, HALF_UP)).sum
        .setScale(4, HALF_UP).toDouble
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L),
      ("c", "b", 1L))
    val wdeg = Map("a" -> 1L, "b" -> 2L, "c" -> 1L)
    def step(r: Map[String, Double]): Map[String, Double] =
      edges.groupBy(_._2).map { case (v, es) =>
        v -> ((1.0 - 0.85) + 0.85 * qsum(es.map { case (u, _, w) =>
          (w.toDouble / wdeg(u).toDouble) * r(u)
        }))
      }
    val r2 = step(step(Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)))
    assert(got.toSeq == Seq("b", "a", "c").map(w => (w, r2(w))),
      s"got ${got.toSeq}, expected ranks $r2")
    assert(r2("b") > r2("a") && r2("a") == r2("c"))
    intercept[IllegalArgumentException] {
      Pipeline.textrankKeywords(docs, "body", iters = 0)
    }
  }

  test("knBigramModel: property — P_KN is a proper distribution per " +
      "context on random corpora (unseen mass included)") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docGen = Gen.chooseNum(2, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, docGen))
    val p = Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("post_key", "body")
      val rows = Pipeline.knBigramModel(df, "body").collect()
        .map(r => ((r.getString(0), r.getString(1)),
          (r.getDouble(6), r.getDouble(7), r.getDouble(8))))
      val pCont = rows.map { case ((_, b), (pc, _, _)) => b -> pc }
        .toMap.withDefaultValue(0.0)
      val lam = rows.map { case ((a, _), (_, l, _)) => a -> l }.toMap
      val pkn = rows.map { case ((a, b), (_, _, pk)) => (a, b) -> pk }.toMap
      val vocab = docs.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
      lam.keys.forall { a =>
        val tot = vocab.map(b => pkn.getOrElse((a, b), lam(a) * pCont(b))).sum
        math.abs(tot - 1.0) < 1e-9
      }
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(6), p)
    assert(r.passed, r.status.toString)
  }

  test("hllSketch: property — merging the sketches of any split equals " +
      "the sketch of the whole corpus") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("x", "y", "zz", "ww", "é", "𝄞"))
        .map(_.mkString(" ")))
    val gen = for {
      n <- Gen.chooseNum(2, 8)
      docs <- Gen.listOfN(n, docGen)
      cut <- Gen.chooseNum(1, n - 1)
    } yield (docs, cut)
    def df(docs: Seq[String]) = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("post_key", "body")
    val p = Prop.forAll(gen) { case (docs, cut) =>
      val (a, b) = docs.splitAt(cut)
      val merged = Pipeline.hllMerge(
        Pipeline.hllSketch(df(a), "body")
          .unionAll(Pipeline.hllSketch(df(b), "body")))
        .collect()(0).getSeq[Long](0)
      merged == Pipeline.hllSketch(df(docs), "body")
        .collect()(0).getSeq[Long](0)
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(6), p)
    assert(r.passed, r.status.toString)
  }

  test("knBigramScore: all four backoff outcomes by hand — seen, " +
      "unseen-bigram, unseen-context, OOV-excluded; decimal mean") {
    import spark.implicits._
    val ref = Seq((1L, "a b a b c")).toDF("post_key", "body")
    val docs = Seq(
      (10L, "a b z"),     // seen (a,b); (b,z): z is OOV → excluded
      (11L, "c a b"),     // (c,a): context c unattested → p_cont(a);
                          // (a,b) seen
      (12L, "b b"),       // unseen bigram, attested context → λ·p_cont
      (13L, "x"))         // one word → no row
      .toDF("post_key", "body")
    val got = Pipeline.knBigramScore(ref, docs, "post_key", "body")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Double]))))
      .toMap
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    def r9(x: Double): Double = BigDecimal(x).setScale(9, HALF_UP).toDouble
    def dmean(xs: Seq[Double]): Double =
      xs.map(BigDecimal(_).setScale(10, HALF_UP)).sum
        .setScale(4, HALF_UP).toDouble / xs.length
    // model from "a b a b c": p_kn(b|a)=.75, λ(b)=.75, p_cont = 1/3 each
    assert(got(10L) == ((2L, 1L, 0L, 1L, Some(dmean(Seq(r9(math.log(0.75))))))))
    assert(got(11L) == ((2L, 1L, 1L, 0L,
      Some(dmean(Seq(r9(math.log(1.0 / 3)), r9(math.log(0.75))))))))
    assert(got(12L) == ((1L, 0L, 1L, 0L,
      Some(dmean(Seq(r9(math.log(0.75 * (1.0 / 3)))))))))
    assert(!got.contains(13L))
  }

  test("knTrigramScore: every backoff level by hand — seen trigram, " +
      "lambda3 to P2, unattested context to P2, OOV excluded") {
    import spark.implicits._
    val ref = Seq((1L, "a b a b c")).toDF("post_key", "body")
    val docs = Seq(
      (10L, "a b a"),    // seen trigram → P3 = .40625
      (11L, "a b b"),    // unseen trigram, ctx (a,b) attested, (b,b)
                         // unseen continuation → λ3·λ2·P1 = .75·.25
      (12L, "c a b"),    // ctx (c,a) unattested → P2(b|a) = .5
      (13L, "c c z"),    // z never a continuation → OOV, excluded
      (14L, "x y"))      // < 3 words → no row
      .toDF("post_key", "body")
    val got = Pipeline.knTrigramScore(ref, docs, "post_key", "body")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Double]))))
      .toMap
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    def r9(x: Double): Double = BigDecimal(x).setScale(9, HALF_UP).toDouble
    def dmean(xs: Seq[Double]): Double =
      xs.map(BigDecimal(_).setScale(10, HALF_UP)).sum
        .setScale(4, HALF_UP).toDouble / xs.length
    assert(got(10L) == ((1L, 1L, 0L, 0L,
      Some(dmean(Seq(r9(math.log(0.40625))))))))
    assert(got(11L) == ((1L, 0L, 1L, 0L,
      Some(dmean(Seq(r9(math.log(0.75 * (0.75 * (1.0 / 3))))))))))
    assert(got(12L) == ((1L, 0L, 1L, 0L,
      Some(dmean(Seq(r9(math.log(0.5))))))))
    assert(got(13L) == ((1L, 0L, 0L, 1L, None)))
    assert(!got.contains(14L))
  }

  test("fleschSignal: hand counts for words/sentences/syllables with " +
      "both floors; no-word docs carry no row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. It ran!"),
      (2L, "xyzzzz"),                       // no vowels, no punctuation
      (3L, "   "), (4L, null.asInstanceOf[String]))
      .toDF("post_key", "body")
    val got = Pipeline.fleschSignal(docs, "post_key", "body").collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def score(w: Long, s: Long, y: Long): Double =
      206.835 - 1.015 * (w.toDouble / s.toDouble) -
        84.6 * (y.toDouble / w.toDouble)
    assert(got == Map(
      1L -> ((5L, 2L, 5L, score(5, 2, 5))),
      2L -> ((1L, 1L, 1L, score(1, 1, 1)))))
  }

  test("knTrigramModel: hand-computed three-level probabilities on " +
      "'a b a b c', and P3 is proper per context including unseen " +
      "lambda-weighted mass") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c")).toDF("post_key", "body")
    val rows = Pipeline.knTrigramModel(docs, "body").collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8), r.getLong(9),
          r.getDouble(10), r.getDouble(11), r.getDouble(12)))).toMap
    // trigrams (a,b,a), (b,a,b), (a,b,c) each once; bt: (b,a),(a,b),
    // (b,c) chat=1; ctx2 b:(2,2) a:(1,1); uni a/b/c n1=1; ntot=3
    assert(rows.keySet == Set(("a", "b", "a"), ("b", "a", "b"),
      ("a", "b", "c")))
    val aba = rows(("a", "b", "a"))
    assert((aba._1, aba._2, aba._3, aba._4, aba._5, aba._6, aba._7) ==
      ((1L, 2L, 2L, 1L, 2L, 2L, 1L)))
    assert(aba._8 == 1.0 / 3)                          // p1(a)
    val p2ab = (1.0 - 0.75) / 2 + (0.75 * 2 / 2) * (1.0 / 3)  // P2(a|b)
    assert(aba._9 == p2ab && p2ab == 0.375)
    assert(aba._10 == (1.0 - 0.75) / 2 + (0.75 * 2 / 2) * p2ab) // .40625
    val bab = rows(("b", "a", "b"))
    val p2ba = (1.0 - 0.75) / 1 + (0.75 * 1 / 1) * (1.0 / 3)    // P2(b|a)
    assert(bab._9 == p2ba && bab._10 == (1.0 - 0.75) / 1 + 0.75 * p2ba)
    // normalization over vocab {a,b,c} for context (a,b): seen a,c at
    // .40625 each; unseen b gets lambda3(a,b)·P2(b|b) where (b,b) is
    // an unseen continuation → P2 = lambda2(b)·p1(b) = .75·(1/3)·...
    val p2bb = (0.75 * 2 / 2) * (1.0 / 3)   // .25
    val lam3ab = 0.75 * 2 / 2
    val total = 0.40625 + 0.40625 + lam3ab * p2bb
    assert(math.abs(total - 1.0) < 1e-12, s"context (a,b) sums to $total")
    intercept[IllegalArgumentException] {
      Pipeline.knTrigramModel(docs, "body", discount = 0.0)
    }
  }

  test("gloveCooc: per-distance counts by hand, xij folds 1/d in " +
      "ascending order, ties break on the pair") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b")).toDF("post_key", "body")
    val got = Pipeline.gloveCooc(docs, "body", window = 2, k = 10).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4))))
    assert(got.map(_._1).toSeq ==
      Seq(("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")))
    val m = got.toMap
    assert(m(("a", "b")) == ((3L, 0L, 3.0)))
    assert(m(("b", "a")) == ((3L, 0L, 3.0)))
    assert(m(("a", "a")) == ((0L, 2L, 1.0)))
    assert(m(("b", "b")) == ((0L, 2L, 1.0)))
    intercept[IllegalArgumentException] {
      Pipeline.gloveCooc(docs, "body", window = 2, k = 0)
    }
  }

  test("bloomDedup: members always flag, NULL text never, FPs are the " +
      "all-k-positions semantics — not exact membership") {
    import spark.implicits._
    val ref = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("post_key", "body")
    val probe = Seq(
      (10L, "alpha beta"),          // member (same text, different id)
      (11L, "something else"),      // non-member
      (12L, null.asInstanceOf[String]), // NULL text: never flags
      (13L, "gamma delta"))         // member
      .toDF("post_key", "body")
    val out = Pipeline.bloomDedup(probe, ref, "body", mBits = 1 << 20, k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("bloom_hits"), r.getAs[Boolean]("in_bloom"))).toMap
    assert(out(10L) == ((4L, true)) && out(13L) == ((4L, true)))
    assert(!out(11L)._2 && out(12L) == ((0L, false)))
    // alien caller columns survive alongside the two added ones
    val cols = Pipeline.bloomDedup(probe, ref, "body", 1 << 20, 4).columns
    assert(cols.toSeq == Seq("post_key", "body", "bloom_hits", "in_bloom"))
    // a LOADED filter false-positives — the Bloom trade, not a bug: at
    // mBits = 2 one reference doc sets both bits (positions alternate
    // parity because h2 is odd), so EVERY non-null probe claims
    // membership while the k-hit count stays honest
    val tiny = Pipeline.bloomDedup(probe, ref.limit(1), "body",
      mBits = 2, k = 3).collect()
    assert(tiny.filter(_.getAs[String]("body") != null)
      .forall(_.getAs[Boolean]("in_bloom")))
    assert(!tiny.find(_.getLong(0) == 12L).get.getAs[Boolean]("in_bloom"))
    // an EMPTY reference (all-NULL texts) flags nothing
    val none = Pipeline.bloomDedup(probe,
      Seq(Tuple1(null.asInstanceOf[String])).toDF("body"), "body", 1024, 3)
      .collect()
    assert(none.forall(!_.getAs[Boolean]("in_bloom")))
  }

  test("unimaxSample: integer waterfilling caps at epochs·n_l, spreads " +
      "the rest; greedy prefix honors the quota") {
    import spark.implicits._
    // stratum a: 2 docs × 10 tokens (n=20); b: 5 docs × 20 (n=100).
    // budget 60, epochs 1 → c = [20, 100]; a capped (20·2 = 40 ≤ 60),
    // b uncapped with quota (60 − 20)/1 = 40 → exactly 2 of b's docs.
    val docs = (Seq((1L, "a", 10L), (2L, "a", 10L)) ++
      (10L to 14L).map(i => (i, "b", 20L))).toDF("post_key", "grp", "toks")
    val out = Pipeline.unimaxSample(docs, "post_key", "grp", "toks",
      budget = 60L, epochs = 1)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Long]("quota")))
    assert(out.filter(_._2 == "a").map(_._1).toSet == Set(1L, 2L))
    assert(out.filter(_._2 == "a").forall(_._3 == 20L))
    val b = out.filter(_._2 == "b")
    assert(b.length == 2 && b.forall(_._3 == 40L))
    // epochs scale capacity: at epochs = 3, a's cap triples (60) and
    // the quota column reports the repetition surplus over one epoch
    val e3 = Pipeline.unimaxSample(docs, "post_key", "grp", "toks",
      budget = 1000L, epochs = 3).collect()
      .map(r => (r.getString(1), r.getAs[Long]("quota"))).distinct.sorted
    assert(e3.toSeq == Seq(("a", 60L), ("b", 300L)))
    // all strata capped → every doc admits, and the uncapped division
    // branch (u = 0) is never evaluated
    assert(Pipeline.unimaxSample(docs, "post_key", "grp", "toks",
      budget = 1000L, epochs = 3).count() == 7)
    // caller columns + (rk, quota), id and stratum first
    assert(Pipeline.unimaxSample(docs, "post_key", "grp", "toks", 60L)
      .columns.toSeq == Seq("post_key", "grp", "toks", "rk", "quota"))
    intercept[IllegalArgumentException] {
      Pipeline.unimaxSample(docs, "post_key", "grp", "toks", 60L, epochs = 0)
    }
    intercept[IllegalArgumentException] {
      Pipeline.unimaxSample(docs, "post_key", "grp", "toks", -1L)
    }
  }

  test("cmsSketch/cmsEstimate: never undercounts, exact at ample width, " +
      "total-collapse at width 1, absent and NULL items read 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "red red red blue"),
      (2L, "red blue green"),
      (3L, null.asInstanceOf[String]))
      .toDF("post_key", "body")
    val items = Seq("red", "blue", "green", "absent", null)
      .map(Tuple1(_)).toDF("term")
    // ample width: 4 distinct words in 2^16 cells — no collisions, the
    // estimate IS the exact count (md5 positions are deterministic, so
    // this either never passes or always does)
    val wide = Pipeline.cmsSketch(docs, "body", depth = 3, width = 1 << 16)
    val est = Pipeline.cmsEstimate(items, "term", wide, 3, 1 << 16)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("cms_est"))
      .toMap
    assert(est == Map("red" -> 4L, "blue" -> 2L, "green" -> 1L,
      "absent" -> 0L, (null: String) -> 0L))
    // width 1: every occurrence lands in the one cell — the estimate
    // degenerates to the total token count for every present item,
    // the documented sum-on-collision overcount at its extreme
    val narrow = Pipeline.cmsSketch(docs, "body", depth = 2, width = 1)
    val est1 = Pipeline.cmsEstimate(items.filter($"term".isNotNull),
      "term", narrow, 2, 1)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("cms_est"))
      .toMap
    assert(est1.values.toSet == Set(7L)) // 7 tokens total, NULL doc ignored
    // caller columns survive; the sketch's internal columns do not
    assert(Pipeline.cmsEstimate(items, "term", wide, 3, 1 << 16)
      .columns.toSeq == Seq("term", "cms_est"))
  }

  test("dedupLinesWithinDoc: dup lines drop, blanks survive, order kept") {
    import spark.implicits._
    val pages = Seq(
      (1L, "nav menu\nbody text\nnav menu\n\nnav menu\nfooter"),
      (2L, "only line"),
      (3L, null.asInstanceOf[String]),
      (4L, ""),
      (5L, "  \n  \na"),   // identical whitespace lines both survive
      (6L, "a\n\t\nb\n\t\nc")) // tab-only lines are structure too
      .toDF("page_id", "content")
    val got = Pipeline.dedupLinesWithinDoc(pages, "page_id", "content")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(got(0) == ((1L, 6L, 4L, "nav menu\nbody text\n\nfooter")))
    assert(got(1) == ((2L, 1L, 1L, "only line")))
    assert(got(2) == ((3L, 0L, 0L, "")))          // NULL text → empty
    assert(got(3) == ((4L, 1L, 1L, "")))          // one empty line, kept
    assert(got(4) == ((5L, 3L, 3L, "  \n  \na"))) // blanks never dedup
    assert(got(5) == ((6L, 5L, 5L, "a\n\t\nb\n\t\nc"))) // incl. tab-only
    // custom separator
    val piped = Seq((9L, "a|b|a|b|c")).toDF("k", "t")
    val ps = Pipeline.dedupLinesWithinDoc(piped, "k", "t", sep = "|")
      .collect().head
    assert(ps.getString(3) == "a|b|c" && ps.getLong(2) == 3L)
  }

  test("neardupBloomBuild/FlagAgainstBloom: exact twin flags, clean docs pass") {
    import spark.implicits._
    // reference = the E document; the probe side carries E's exact
    // copy (identical band keys → flagged with certainty), unrelated
    // docs, a 4-word doc and a NULL (no band keys → never flagged)
    val ref = corpus.filter(col("post_key") === 14L)
    val probe = corpus.filter(col("post_key").isin(10L, 12L, 15L))
      .unionByName(Seq((20L, "too few words here"),
        (21L, null.asInstanceOf[String])).toDF("post_key", "body"))
    val flagged = Pipeline.neardupFlagAgainstBloom(probe, "body",
      Pipeline.neardupBloomBuild(ref, "body", mBits = 1 << 16, k = 4),
      mBits = 1 << 16, k = 4)
      .collect().map(r => r.getAs[Long]("post_key") ->
        r.getAs[Boolean]("neardup_in_ref")).toMap
    assert(flagged(15L))                    // exact copy of the reference
    assert(!flagged(10L) && !flagged(12L))  // unrelated corpora
    assert(!flagged(20L) && !flagged(21L))  // short/NULL: no band keys
    // derived-column clash fails fast
    assert(intercept[IllegalArgumentException] {
      Pipeline.neardupFlagAgainstBloom(
        probe.withColumn("neardup_in_ref", lit(true)), "body",
        Pipeline.neardupBloomBuild(ref, "body", 1 << 16, 4), 1 << 16, 4)
    }.getMessage.contains("neardup_in_ref"))
  }

  test("minhashNeardupAgainstCorpus: cross pairs only, same arithmetic") {
    // new = {A, E-copy-1}, ref = {B, C, D, E-copy-2}: the edited pair
    // and the exact pair cross sides → both flagged with the exact
    // within-corpus jaccards (51/61 and 1.0)
    val newSide = corpus.filter(col("post_key").isin(10L, 14L))
    val refSide = corpus.filter(col("post_key").isin(11L, 12L, 13L, 15L))
    val got = Pipeline.minhashNeardupAgainstCorpus(
      newSide, refSide, "post_key", "body")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((10L, 11L, 51.0 / 61), (14L, 15L, 1.0)))
    // asymmetry: both exact copies on the NEW side → never paired
    // with each other (no new-new candidates by construction)
    val sameSide = Pipeline.minhashNeardupAgainstCorpus(
      corpus.filter(col("post_key").isin(14L, 15L)),
      corpus.filter(col("post_key") === 12L),
      "post_key", "body")
    assert(sameSide.count() == 0)
    assert(intercept[IllegalArgumentException] {
      Pipeline.minhashNeardupAgainstCorpus(newSide, refSide,
        "post_key", "body", jaccardMin = 0.0)
    }.getMessage.contains("jaccardMin"))
  }

  test("mojibakeSignals: detects the double-encode family, repairs only " +
    "when provably safe; alien columns") {
    import spark.implicits._
    val docs = Seq(
      // classic Latin-1 double-encode of "café déjà vu" — repairable.
      // 'à' (C3 A0) mis-decodes to 'Ã' + NBSP, hence the  : a
      // plain space there would be C3 20 — invalid UTF-8, unrepairable
      (1L, "cafÃ© dÃ©jÃ  vu"),
      // clean ASCII — untouched, zero signals
      (2L, "plain ascii text"),
      // Windows-1252 curly-quote damage ('â€œ') — detected, NOT
      // repaired (the round-trip would mangle '€' to '?')
      (3L, "he said â€œhelloâ€ there"),
      // U+FFFD scar — information already destroyed, no repair
      (4L, "br�ken text"),
      // lone 'Ã' whose round-trip is invalid UTF-8 (0xC3 then space):
      // the candidate-validity guard must keep the original
      (5L, "stray Ã marker"),
      // clean non-ASCII that LOOKS repaired already — zero signals
      (6L, "café déjà vu")).toDF("post_key", "body")
    val out = Pipeline.mojibakeSignals(docs, "post_key", "body")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_latin1"),
        r.getAs[Long]("n_win1252"), r.getAs[Long]("n_replacement"),
        r.getAs[Boolean]("fixed"), r.getAs[String]("text_fixed")))
    assert(out(0) == (1L, 3L, 0L, 0L, true, "café déjà vu"))
    assert(out(1) == (2L, 0L, 0L, 0L, false, "plain ascii text"))
    assert(out(2)._1 == 3L && out(2)._3 == 2L && !out(2)._5 &&
      out(2)._6 == "he said â€œhelloâ€ there")
    assert(out(3) == (4L, 0L, 0L, 1L, false, "br�ken text"))
    // the guard: decode(encode('Ã '))  contains U+FFFD → keep original
    assert(out(4)._1 == 5L && out(4)._2 == 1L && !out(4)._5 &&
      out(4)._6 == "stray Ã marker")
    assert(out(5) == (6L, 0L, 0L, 0L, false, "café déjà vu"))
    // ratio: doc 1 has 15 chars ("cafÃ©" 5 + " " + "dÃ©jÃ<nbsp>" 6 + " vu" 3),
    // 3 'Ã' markers
    val ratios = Pipeline.mojibakeSignals(docs, "post_key", "body")
      .orderBy(col("doc_id")).collect().map(_.getAs[Double]("mojibake_ratio"))
    assert(math.abs(ratios(0) - 3.0 / 15) < 1e-12)
    assert(ratios(1) == 0.0)
  }

  test("multimodalNeardupPairs: full-outer modality classification; " +
    "missing columns rejected") {
    import spark.implicits._
    val tp = Seq((1L, 2L, 0.9), (3L, 4L, 0.8)).toDF("doc_a", "doc_b", "jaccard")
    val ip = Seq((1L, 2L, 1), (5L, 6L, 0)).toDF("doc_a", "doc_b", "hamming")
    val got = Pipeline.multimodalNeardupPairs(tp, ip)
      .orderBy(col("doc_a")).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)),
        Option(r.get(3)), r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, Some(0.9), Some(1), "both"),
      (3L, 4L, Some(0.8), None, "text"),
      (5L, 6L, None, Some(0), "image")))
    assert(intercept[IllegalArgumentException] {
      Pipeline.multimodalNeardupPairs(tp.drop("jaccard"), ip)
    }.getMessage.contains("jaccard"))
  }

  test("blockedRecordLinkage: pairs only within blocks, exact distances, " +
    "NULL fields never link, blockCap drops degenerate blocks") {
    import spark.implicits._
    val recs = Seq(
      (1L, "east", "jon smith"),
      (2L, "east", "john smith"),   // dist 1 to #1
      (3L, "east", "mary jones"),   // far from both
      (4L, "west", "jon smith"),    // exact text of #1 — but other block
      (5L, "east", null.asInstanceOf[String]), // NULL field: never links
      (6L, "west", "jon smythe"))   // dist 2 to #4's "jon smith"
      .toDF("user_id", "region", "full_name")
    val got = Pipeline.blockedRecordLinkage(recs, "user_id",
      Seq("region"), "full_name", maxDist = 2)
      .orderBy(col("id_a"), col("id_b")).collect()
      .map(r => (r.getAs[String]("region"), r.getAs[Long]("id_a"),
        r.getAs[Long]("id_b"), r.getAs[Long]("dist")))
    // (1,2) linked at dist 1; (1,4) NEVER compared (blocks differ)
    // despite identical text; (4,6) at dist 2; NULL row links nowhere
    assert(got.toSeq == Seq(("east", 1L, 2L, 1L), ("west", 4L, 6L, 2L)))
    // sim arithmetic: 1 − 1/10 for the (1,2) pair
    val sim = Pipeline.blockedRecordLinkage(recs, "user_id",
      Seq("region"), "full_name", maxDist = 2)
      .filter(col("id_a") === 1L).collect()(0).getAs[Double]("sim")
    assert(math.abs(sim - 0.9) < 1e-12)
    // a degenerate blocking key (every record one block) past blockCap
    // drops the block — no quadratic pair explosion
    val flood = (1L to 10L).map(i => (i, "all", s"name$i"))
      .toDF("user_id", "region", "full_name")
    assert(Pipeline.blockedRecordLinkage(flood, "user_id", Seq("region"),
      "full_name", maxDist = 99, blockCap = 9).count() == 0)
    // NULL blocking keys never link (key EQUALITY, the oracle's join
    // semantics — review r18): two identical names both missing the
    // key must NOT pool into a NULL block and pair
    val nullKeys = Seq(
      (1L, null.asInstanceOf[String], "same name"),
      (2L, null.asInstanceOf[String], "same name"),
      (3L, "east", "same name"))
      .toDF("user_id", "region", "full_name")
    assert(Pipeline.blockedRecordLinkage(nullKeys, "user_id",
      Seq("region"), "full_name", maxDist = 0).count() == 0)
    assert(intercept[IllegalArgumentException] {
      Pipeline.blockedRecordLinkage(recs, "user_id", Seq.empty,
        "full_name", maxDist = 1)
    }.getMessage.contains("blocking column"))
  }

  test("silhouetteReport: perfectly separated blobs score 1.0 exactly; " +
    "k < 2 rejected; alien columns") {
    import spark.implicits._
    // two blobs whose members sit EXACTLY on their centroid: a = 0,
    // b = |centroid gap|, s = 1 for every point — the quantized sum is
    // n·1e7 with no float slack. min-id seeds: ids 0 (blob A) and 1
    // (blob B) seed the two clusters.
    val pts = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(8f, 8f, 8f, 8f)),
      (2L, Seq(0f, 0f, 0f, 0f)), (3L, Seq(0f, 0f, 0f, 0f)),
      (4L, Seq(8f, 8f, 8f, 8f)), (5L, Seq(8f, 8f, 8f, 8f)))
      .toDF("vid", "emb")
    val rep = Pipeline.silhouetteReport(pts, "vid", "emb", k = 2, dim = 4)
      .orderBy(col("cluster")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rep.toSeq == Seq(
      (0, 3L, 3L * 10000000L, 1.0e7),
      (1, 3L, 3L * 10000000L, 1.0e7)))
    assert(intercept[IllegalArgumentException] {
      Pipeline.silhouetteReport(pts, "vid", "emb", k = 1, dim = 4)
    }.getMessage.contains("k >= 2"))
    // Lloyd's emptying down to ONE surviving centroid must error, not
    // report s ≈ 1.0 against the MaxValue sentinel (review r18): all
    // points identical → both min-id seeds coincide → cluster 1 empties
    val degenerate = Seq(
      (0L, Seq(1f, 1f, 1f, 1f)), (1L, Seq(1f, 1f, 1f, 1f)),
      (2L, Seq(1f, 1f, 1f, 1f))).toDF("vid", "emb")
    val e = intercept[Exception] {
      Pipeline.silhouetteReport(degenerate, "vid", "emb", k = 2, dim = 4)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("surviving centroids")))
  }

  test("curriculumOrder: positions are a bucket-ascending permutation; " +
      "within-bucket order is the md5 shuffle; alien columns pass through") {
    import spark.implicits._
    val corpus = Seq(
      (1L, 0, "x1"), (2L, 2, "x2"), (3L, 0, "x3"), (4L, 1, "x4"),
      (5L, 2, "x5"), (6L, 0, "x6"), (7L, 1, "x7")).toDF("k", "band", "extra")
    val got = Pipeline.curriculumOrder(corpus, "k", "band").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4)))
    // pos is a permutation of 1..n
    assert(got.map(_._4).sorted.toSeq == (1L to 7L))
    // bucket blocks: every bucket-0 pos < every bucket-1 pos < bucket-2
    val byBand = got.groupBy(_._2).view.mapValues(_.map(_._4)).toMap
    assert(byBand(0).max < byBand(1).min && byBand(1).max < byBand(2).min)
    // rk is 1..count within each bucket and pos = offset + rk
    assert(byBand.keys.forall(b =>
      got.filter(_._2 == b).map(_._3).sorted.toSeq ==
        (1L to byBand(b).length)))
    // within-bucket order is md5("band:k"), k tie-break — replay it
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val expect0 = Seq(1L, 3L, 6L).sortBy(k => (md5hex(s"0:$k"), k))
    assert(got.filter(_._2 == 0).sortBy(_._3).map(_._1).toSeq == expect0)
    // alien column survives, output column order is id, bucket, rest
    assert(Pipeline.curriculumOrder(corpus, "k", "band").columns.toSeq ==
      Seq("k", "band", "extra", "rk", "pos"))
    // a NULL bucket raises loudly instead of vanishing through the
    // offset equi-join (review r18.2)
    val withNull = Seq((1L, Some(0), "x"), (2L, None, "y"))
      .toDF("k", "band", "extra")
    val eNull = intercept[Exception](
      Pipeline.curriculumOrder(withNull, "k", "band").collect())
    def msgsN(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgsN(x.getCause))
    assert(msgsN(eNull).exists(_.contains("NULL bucket")))
  }

  test("balancedShards: two-level rank equals the global tokens-desc sort; " +
      "snake placement balances totals; degenerate shapes") {
    import spark.implicits._
    // token counts straddle several binary size classes (1..3000) so
    // the class+offset construction is genuinely exercised
    val rows = (1L to 40L).map(k => (k, ((k * 37) % 61) * 50 + k))
    val corpus = rows.toDF("k", "toks")
    val got = Pipeline.balancedShards(corpus, "k", "toks", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // rank must equal the plain global (tokens DESC, id ASC) order
    val expectRank = rows.sortBy { case (k, t) => (-t, k) }
      .zipWithIndex.map { case ((k, _), i) => k -> (i + 1L) }.toMap
    assert(got.forall { case (k, _, rank, _) => rank == expectRank(k) },
      s"two-level rank diverged from the global sort: ${got.toSeq}")
    // snake: rank r → (r-1) mod 8 folded at 4
    assert(got.forall { case (_, _, r, s) =>
      val r0 = (r - 1) % 8
      s == (if (r0 < 4) r0 else 7 - r0)
    })
    // balance: every shard gets 10 docs and totals stay within the
    // largest single doc of each other (snake pairs big with small)
    val totals = got.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    assert(totals.keySet == Set(0, 1, 2, 3) &&
      got.groupBy(_._4).forall(_._2.length == 10))
    assert(totals.values.max - totals.values.min <= got.map(_._2).max,
      s"snake balance violated: $totals")
    // nShards = 1: everything lands in shard 0
    assert(Pipeline.balancedShards(corpus, "k", "toks", 1)
      .select("shard").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
    // null token counts rank as 0 (last), and the guard is loud
    val withNull = Seq((1L, Some(5L)), (2L, None)).toDF("k", "toks")
    val nulled = Pipeline.balancedShards(withNull, "k", "toks", 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(nulled == Map(1L -> 1L, 2L -> 2L))
    assert(intercept[IllegalArgumentException](
      Pipeline.balancedShards(corpus, "k", "toks", 0))
      .getMessage.contains("nShards"))
  }

  test("semanticDecontaminate: max cosine + threshold flag; empty eval " +
      "raises loudly; corpus columns pass through") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.6f, 0.8f)), (3L, Seq(0f, 1f)))
      .toDF("k", "v")
    val evalSet = Seq((90L, Seq(1f, 0f)), (91L, Seq(0f, -1f))).toDF("k", "v")
    val got = Pipeline.semanticDecontaminate(corpus, evalSet, "v", tau = 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    // cos vs eval {(1,0),(0,-1)}: doc1 → max 1.0; doc2 → max 0.6;
    // doc3 → max 0.0 (the −1 eval scores −1)
    assert(got(0) == ((1L, 1.0, 1L, true)))
    assert(math.abs(got(1)._2 - 0.6) < 1e-7 && got(1)._3 == 0L && !got(1)._4)
    assert(got(2) == ((3L, 0.0, 0L, false)))
    // n_over counts EVERY eval item at/above tau, not just the max
    val both = Pipeline.semanticDecontaminate(
      corpus, Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0f))).toDF("k", "v"),
      "v", tau = 0.9).filter(col("k") === 1L).collect().head
    assert(both.getLong(3) == 2L && both.getBoolean(4))
    // an empty eval set raises instead of silently flagging nothing
    val e = intercept[Exception] {
      Pipeline.semanticDecontaminate(corpus, evalSet.limit(0), "v", 0.9)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("empty eval set")))
    // an unscoreable corpus row raises its OWN accurate error, not the
    // empty-eval one (review r18.2)
    val unscoreable = Seq((9L, null.asInstanceOf[Seq[Float]])).toDF("k", "v")
    val e2 = intercept[Exception] {
      Pipeline.semanticDecontaminate(corpus.union(unscoreable), evalSet,
        "v", 0.9).collect()
    }
    assert(msgs(e2).exists(_.contains("unscoreable")), msgs(e2).mkString("; "))
    assert(intercept[IllegalArgumentException](
      Pipeline.semanticDecontaminate(corpus, evalSet, "v", 1.5))
      .getMessage.contains("tau"))
  }

  test("scriptMixSignals: hand-counted codepoint classes; NULL text zeros; " +
      "astral chars never skew the UTF-16 counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Abc 12 你好 да \t"),
      (2L, null.asInstanceOf[String]),
      // the emoji is astral (surrogate pair in UTF-16) and belongs to
      // NO class — deleting complements must drop it cleanly so every
      // count stays a codepoint count
      (3L, "a😀b 7")).toDF("k", "text")
    // caller columns pass through: counts start after (k, text)
    val got = Pipeline.scriptMixSignals(docs, "text").collect()
      .map(r => r.getLong(0) -> (2 to 7).map(r.getLong)).toMap
    // "Abc 12 你好 да \t": 3 ascii letters, 2 digits, 2 CJK,
    // 2 cyrillic, 0 arabic, 5 whitespace (4 spaces + tab)
    assert(got(1L) == Seq(3L, 2L, 2L, 2L, 0L, 5L), s"got ${got(1L)}")
    assert(got(2L) == Seq(0L, 0L, 0L, 0L, 0L, 0L))
    assert(got(3L) == Seq(2L, 1L, 0L, 0L, 0L, 1L), s"got ${got(3L)}")
  }

  test("embeddingNeardupAgainstCorpus: exact twins always surface; pairs " +
      "are cross-side only; tau filters; within-side dups never emitted") {
    import spark.implicits._
    // deterministic vectors: two exact cross-side twins (1≡101, 3≡103),
    // one within-NEW twin pair (5, 7) that must NOT pair, and noise
    def vec(seed: Int): Seq[Float] =
      (1 to 16).map(j => (((seed * 31 + j * 17) % 97) / 48.5f - 1f))
    val newSide = Seq(
      (1L, vec(1)), (3L, vec(3)), (5L, vec(5)), (7L, vec(5)), (9L, vec(9)))
      .toDF("k", "v")
    val refSide = Seq(
      (101L, vec(1)), (103L, vec(3)), (105L, vec(60))).toDF("k", "v")
    val got = Pipeline.embeddingNeardupAgainstCorpus(newSide, refSide,
      "k", "v", tau = 0.999, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors agree on EVERY hyperplane sign, so the exact
    // twins are guaranteed candidates and score cosine 1.0
    assert(got == Set((1L, 101L), (3L, 103L)), s"got $got")
    // the within-new twin (5, 7) must never appear on either side of a
    // pair — candidates are cross-side ONLY
    assert(!got.exists(p => p._1 == 5L && p._2 == 7L))
    // a permissive tau admits more pairs but never within-side ones
    val loose = Pipeline.embeddingNeardupAgainstCorpus(newSide, refSide,
      "k", "v", tau = -0.999, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.forall(p => p._1 < 100L && p._2 >= 100L))
    assert(got.subsetOf(loose))
    assert(intercept[IllegalArgumentException](
      Pipeline.embeddingNeardupAgainstCorpus(newSide, refSide, "k", "v",
        tau = 1.5, dim = 16)).getMessage.contains("tau"))
    // a dimension mismatch raises LOUDLY instead of zeroing one side's
    // SRP bits and reporting "no pairs" (review r18.2)
    val short = Seq((201L, Seq(1f, 2f))).toDF("k", "v")
    val eDim = intercept[Exception](
      Pipeline.embeddingNeardupAgainstCorpus(newSide, short, "k", "v",
        tau = 0.5, dim = 16).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(eDim).exists(_.contains("not 16-dimensional")))
  }

  test("embeddingNeardupAgainstCorpus: the bucket cap counts ROWS, not " +
      "distinct ids (the p142 oracle's COUNT(*) semantics)") {
    import spark.implicits._
    val v = (1 to 4).map(_.toFloat)
    val newSide = Seq((1L, v)).toDF("k", "v")
    // 1001 ref ROWS but only 2 distinct ids, all in the same bucket
    // (identical vectors agree on every SRP sign): a distinct-id cap
    // (2 ≤ 1000) would keep the bucket; the row cap must drop it
    val refOver = ((1 to 1000).map(_ => (101L, v)) :+ (102L, v))
      .toDF("k", "v")
    val over = Pipeline.embeddingNeardupAgainstCorpus(newSide, refOver,
      "k", "v", tau = 0.9, dim = 4).collect()
    assert(over.isEmpty, s"row-capped bucket leaked ${over.length} pairs")
    // exactly at the cap the bucket survives and pairs emit (dup ids
    // collapse in the id-pair output, as in the oracle's DISTINCT)
    val refAt = ((1 to 999).map(_ => (101L, v)) :+ (102L, v))
      .toDF("k", "v")
    val at = Pipeline.embeddingNeardupAgainstCorpus(newSide, refAt,
      "k", "v", tau = 0.9, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at == Set((1L, 101L), (1L, 102L)), s"got $at")
  }

  test("collapseByComponentsBest: keeps the max-score member per component; " +
      "NULL scores lose; ties break to the smaller id; unpaired rows survive") {
    import spark.implicits._
    val corpus = Seq(
      (1L, 5L), (2L, 10L), (3L, 7L),   // component 1 → keep 2 (score 10)
      (5L, 4L), (6L, 4L),              // component 5: tie → keep 5 (min id)
      (8L, -1L),                       // component 8 with a NULL partner
      (4L, 99L), (7L, 0L))             // unpaired → always survive
      .toDF("k", "score")
      .withColumn("score", when(col("score") === -1L, lit(null)
        .cast("long")).otherwise(col("score")))
    val nullPartner = Seq((9L, Some(3L))).toDF("k", "score")
    val all = corpus.union(nullPartner.select(col("k"),
      col("score").cast("long")))
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L),
      (8L, 8L), (9L, 8L)).toDF("node", "component")
    val kept = Pipeline.collapseByComponentsBest(all, "k", comps,
      keepBy = col("score")).select("k").collect().map(_.getLong(0)).toSet
    // comp 1 → 2; comp 5 tie at 4 → 5; comp 8: NULL(8) vs 3(9) → 9
    assert(kept == Set(2L, 5L, 9L, 4L, 7L), s"kept $kept")
  }

  test("paddingWasteReport: hand-counted arrival vs sorted waste; guards") {
    import spark.implicits._
    val corpus = Seq((1L, Some(10L)), (2L, Some(1L)), (3L, Some(10L)),
      (4L, None), (5L, Some(10L))).toDF("k", "toks")
    val got = Pipeline.paddingWasteReport(corpus, "k", "toks", batchSize = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // arrival batches (by id): [10,1]→pad 9, [10,0]→pad 10, [10]→0;
    // total 31, padded 19
    assert(got("arrival") == ((3L, 31L, 19L, 19.0 / 50.0)))
    // sorted (desc): [10,10]→0, [10,1]→9, [0]→0; padded 9
    assert(got("sorted") == ((3L, 31L, 9L, 9.0 / 40.0)))
    assert(intercept[IllegalArgumentException](
      Pipeline.paddingWasteReport(corpus, "k", "toks", 0))
      .getMessage.contains("batchSize"))
    // a non-integral id is rejected (the arrival rank keys on it — a
    // silent cast would report n_batches = 0; review r18.2)
    val strId = Seq(("a", 5L)).toDF("k", "toks")
    assert(intercept[IllegalArgumentException](
      Pipeline.paddingWasteReport(strId, "k", "toks", 2))
      .getMessage.contains("integral"))
    // negative token counts fail loudly (binary size classes would
    // silently misorder them)
    val neg = Seq((1L, -5L)).toDF("k", "toks")
    val e = intercept[Exception](
      Pipeline.paddingWasteReport(neg, "k", "toks", 2).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("negative value")))
    // an empty corpus yields ZERO rows — not an n_batches=0 /
    // NULL-totals row per strategy (r18 ADVICE; the oracle's GROUP BY
    // over an empty union)
    val empty = Seq.empty[(Long, Long)].toDF("k", "toks")
    assert(Pipeline.paddingWasteReport(empty, "k", "toks", 2)
      .collect().isEmpty)
  }

  test("ngramDupProfile: hand-counted sweep; short docs drop per n; " +
      "NULL text ignored; parameter guards") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b c"),
      (3L, null.asInstanceOf[String])).toDF("k", "text")
    val got = Pipeline.ngramDupProfile(docs, "text", ns = Seq(1, 2, 4, 8))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // n=1: 7 occurrences of {a,b,c}; n=2: "a b","b a","a b" + "a b","b c"
    assert(got(1) == ((7L, 3L, Some(4.0 / 7.0))))
    assert(got(2) == ((5L, 3L, Some(2.0 / 5.0))))
    // n=4: only doc1 is long enough — its single gram is unique
    assert(got(4) == ((1L, 1L, Some(0.0))))
    // n=8: no doc long enough → zero counts, share undefined (null)
    assert(got(8) == ((0L, 0L, None)))
    assert(intercept[IllegalArgumentException](
      Pipeline.ngramDupProfile(docs, "text", ns = Nil))
      .getMessage.contains("empty"))
    assert(intercept[IllegalArgumentException](
      Pipeline.ngramDupProfile(docs, "text", ns = Seq(2, 2)))
      .getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException](
      Pipeline.ngramDupProfile(docs, "text", ns = Seq(0)))
      .getMessage.contains(">= 1"))
  }

  test("ngramDupProfile approx: HLL distinct tracks exact within the " +
      "documented ±1.6% band; totals identical; empty arm stays zero") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val exact = Pipeline.ngramDupProfile(docs, "text")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val approx = Pipeline.ngramDupProfile(docs, "text", approx = true)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    Seq(1, 2, 4, 8).foreach { n =>
      assert(approx(n)._1 == exact(n)._1,
        s"n=$n: totals diverged (${approx(n)._1} vs ${exact(n)._1})")
      val (e, a) = (exact(n)._2, approx(n)._2)
      // 3σ of the 1.04/√4096 band, plus integer slack for tiny counts
      val tol = math.max(0.05 * e, 3.0)
      assert(math.abs(a - e) <= tol,
        s"n=$n: HLL estimate $a vs exact $e exceeds ±$tol")
    }
    // an all-too-short corpus yields the zero row, not an estimator NaN
    val short = Seq("a b").toDF("text")
    val z = Pipeline.ngramDupProfile(short, "text", ns = Seq(8),
      approx = true).collect().head
    assert(z.getLong(1) == 0L && z.getLong(2) == 0L && z.isNullAt(3),
      s"got $z")
    assert(intercept[IllegalArgumentException](
      Pipeline.ngramDupProfile(docs, "text", approx = true, b = 17))
      .getMessage.contains("b must"))
  }
}
