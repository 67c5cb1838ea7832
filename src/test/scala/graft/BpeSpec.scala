package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** [[Pipeline.bpeTrain]] against a SEQUENTIAL reference implementation
  * of Sennrich'16 BPE — the oracle role DuckDB plays for the other
  * operators (the iterative merge loop is not SQL-expressible in the
  * portable subset, so the reference lives here instead): both sides
  * must produce the IDENTICAL ordered merge list, including the
  * deterministic (count desc, pair asc) tie-break, over adversarial
  * random corpora.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Textbook sequential BPE on the word-frequency dictionary. */
  private def referenceBpe(words: Seq[String], numMerges: Int,
      minPairCount: Long): Seq[(Int, String, String, Long)] = {
    // CODE-POINT split, like the trainer's substr(w, i, 1) and the
    // segmenter's codePointAt walk — a UTF-16 code-unit split would
    // shear astral chars into surrogates and diverge (review r11)
    def cps(w: String): Vector[String] = {
      val b = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp)); i += Character.charCount(cp)
      }
      b.toVector
    }
    val counts = words.groupBy(identity).view.mapValues(_.size.toLong)
    var dict: Map[Vector[String], Long] = counts.map { case (w, c) =>
      (cps(w) :+ "</w>") -> c
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val out = collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var done = false
    while (!done && round <= numMerges) {
      val pairCounts = collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      val best = pairCounts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          out += ((round, l, r, c))
          dict = dict.map { case (syms, cnt) =>
            val merged = collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                merged += (l + r); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.toVector -> cnt
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          round += 1
        case _ => done = true
      }
    }
    out.toSeq
  }

  private def sparkBpe(words: Seq[String], numMerges: Int,
      minPairCount: Long): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    Pipeline.bpeTrain(words.map(w => Tuple1(w)).toDF("text"),
      "text", numMerges, minPairCount)
      .orderBy("merge_no").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("bpeTrain: classic example — frequent pairs merge in order") {
    // the Sennrich paper's flavor: 'low' x5, 'lower' x2, 'newest' x6,
    // 'widest' x3 — 'es'/'est'/'est</w>' chains dominate early merges
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val got = sparkBpe(corpus, 8, minPairCount = 2)
    val want = referenceBpe(corpus, 8, minPairCount = 2)
    assert(got == want)
    // the famous first merges: (e,s) at 9, then (es,t) at 9
    assert(got(0)._2 == "e" && got(0)._3 == "s" && got(0)._4 == 9L)
    assert(got(1)._2 == "es" && got(1)._3 == "t" && got(1)._4 == 9L)
    // merged symbols feed later rounds (multi-char pairs appear)
    assert(got.exists(m => m._2.length > 1 || m._3.length > 1))
  }

  test("bpeTrain: overlapping-run greedy semantics — 'aaaa' merges left-to-right") {
    // pair (a,a) over runs: 'aaaa' -> [aa, aa, </w>], 'aaa' -> [aa, a, </w>]
    val corpus = Seq.fill(4)("aaaa") ++ Seq.fill(3)("aaa")
    val got = sparkBpe(corpus, 3, minPairCount = 2)
    val want = referenceBpe(corpus, 3, minPairCount = 2)
    assert(got == want)
    // first merge is (a,a); its count uses the NON-OVERLAPPING scan:
    // 'aaaa' has 3 adjacent (a,a) pairs per word — counting, not
    // merging; 4*3 + 3*2 = 18
    assert(got(0) == (1, "a", "a", 18L))
  }

  test("bpeTrain: property — merge lists identical to the reference on random corpora") {
    // includes an ASTRAL char (𝄞, U+1D11E — two UTF-16 code units) so
    // the code-point contract is genuinely exercised
    val wordGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "é", "𝄞"))
        .map(_.mkString))
    val corpusGen = Gen.chooseNum(3, 25).flatMap(n => Gen.listOfN(n, wordGen))
    val p = Prop.forAll(corpusGen) { words =>
      sparkBpe(words, numMerges = 6, minPairCount = 2) ==
        referenceBpe(words, numMerges = 6, minPairCount = 2)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  test("bpeTrain: minPairCount stops training before memorizing singletons") {
    val corpus = Seq("ab", "ab", "xy") // (a,b) twice; everything else once
    val got = sparkBpe(corpus, 10, minPairCount = 2)
    assert(got == referenceBpe(corpus, 10, minPairCount = 2))
    // only pairs reaching the floor were learned, and training STOPPED
    assert(got.nonEmpty && got.forall(_._4 >= 2L))
    assert(got.size < 10)
    // degenerate corpus: nothing reaches the floor, empty merge list
    assert(sparkBpe(Seq("q"), 5, minPairCount = 2).isEmpty)
  }

  /** Textbook application: each merge in TRAINING ORDER, one greedy
    * left-to-right pass — the semantics bpe_segment's best-rank loop
    * must reproduce. */
  private def referenceSegment(word: String,
      merges: Seq[(String, String)]): Vector[String] = {
    var syms = {
      val b = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp)); i += Character.charCount(cp)
      }
      (b += "</w>").toVector
    }
    merges.foreach { case (l, r) =>
      val out = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toVector
    }
    syms
  }

  test("bpeSegment: matches in-order reference application; words reassemble") {
    import spark.implicits._
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ Seq("éclair")
    val mergesDf = Pipeline.bpeTrain(
      corpus.map(Tuple1(_)).toDF("text"), "text", 10, minPairCount = 2)
    val merges = mergesDf.orderBy("merge_no").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val docs = Seq((1L, "low lower widest"), (2L, "newest unseen éclair"))
      .toDF("doc_id", "text")
    val got = Pipeline.bpeSegment(docs, "text", mergesDf)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](r.fieldIndex("bpe_tokens")),
          r.getLong(r.fieldIndex("n_bpe_tokens")))).toMap
    val want = Map(
      1L -> Seq("low", "lower", "widest").flatMap(referenceSegment(_, merges)),
      2L -> Seq("newest", "unseen", "éclair").flatMap(referenceSegment(_, merges)))
    assert(got.view.mapValues(_._1).toMap == want)
    assert(got.forall { case (k, (ts, n)) => n == ts.length })
    // lossless: stripping '</w>' and joining reassembles the text's words
    got.foreach { case (k, (ts, _)) =>
      val rebuilt = ts.mkString("").split("</w>").toSeq
      val original = docs.filter(col("doc_id") === k)
        .collect()(0).getString(1).split("\\s+").toSeq
      assert(rebuilt == original, s"doc $k does not reassemble")
    }
    // an empty merge list degrades to pure code-point splitting
    val none = Pipeline.bpeSegment(docs, "text",
      mergesDf.limit(0)).collect()(0).getSeq[String](2)
    assert(none.take(4) == Seq("l", "o", "w", "</w>"))
  }

  test("bpeSegment: segmenting the training corpus reproduces the trained dictionary") {
    import spark.implicits._
    // the closure invariant: tokenize the words BPE was trained on with
    // the full merge list, and you get exactly the trainer's final
    // symbol sequences (reference trainer replayed word by word)
    val words = Seq.fill(4)("abab") ++ Seq.fill(3)("abc") ++ Seq.fill(2)("cab")
    val mergesDf = Pipeline.bpeTrain(
      words.map(Tuple1(_)).toDF("text"), "text", 5, minPairCount = 2)
    val merges = mergesDf.orderBy("merge_no").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = Pipeline.bpeSegment(
      words.distinct.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text"),
      "text", mergesDf)
      .collect().map(r => r.getString(1) -> r.getSeq[String](2)).toMap
    words.distinct.foreach { w =>
      assert(seg(w) == referenceSegment(w, merges), s"word $w diverges")
    }
  }

  test("bpeSegment: property — random unseen words match the reference applier") {
    import spark.implicits._
    // train once on a fixed corpus, then segment RANDOM words (mostly
    // unseen, incl. astral chars) — the best-rank loop must equal the
    // in-order reference application on every one
    val corpus = Seq.fill(6)("abab") ++ Seq.fill(4)("abba") ++ Seq.fill(3)("ca")
    val mergesDf = Pipeline.bpeTrain(
      corpus.map(Tuple1(_)).toDF("text"), "text", 6, minPairCount = 2)
    val merges = mergesDf.orderBy("merge_no").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val wordGen = Gen.chooseNum(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "𝄞")).map(_.mkString))
    val p = Prop.forAll(Gen.listOfN(10, wordGen)) { ws =>
      val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val got = Pipeline.bpeSegment(docs, "text", mergesDf)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
      ws.zipWithIndex.forall { case (w, i) =>
        got(i.toLong) == referenceSegment(w, merges)
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  test("bpeSegment composes with packSequences: real token counts drive packing") {
    import spark.implicits._
    // the end-to-end pretraining-prep chain: learn a vocab, tokenize,
    // pack into context windows by the REAL bpe token counts
    val corpus = Seq.fill(6)("aa bb aa") ++ Seq.fill(4)("aa cc")
    val mergesDf = Pipeline.bpeTrain(
      corpus.map(Tuple1(_)).toDF("text"), "text", 4, minPairCount = 2)
    val docs = Seq(
      (1L, "s0", "aa bb aa"), (2L, "s0", "aa cc"),
      (3L, "s1", "aa bb aa aa bb aa"), (4L, "s1", "cc"))
      .toDF("doc_id", "shard", "text")
    val toks = Pipeline.bpeSegment(docs, "text", mergesDf)
    val packed = Pipeline.packSequences(toks, "doc_id", "shard",
      col("n_bpe_tokens"), contextLen = 8)
    val rows = packed.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("tok_offset")),
          r.getLong(r.fieldIndex("tok"))))
      .toMap
    // every doc packed; offsets are a gapless prefix sum of the real
    // BPE counts in (shard, doc) order
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    val inOrder = packed.orderBy("tok_offset").collect()
      .map(r => (r.getLong(r.fieldIndex("tok_offset")),
        r.getLong(r.fieldIndex("tok"))))
    inOrder.sliding(2).foreach {
      case Array((o1, n1), (o2, _)) => assert(o2 == o1 + n1, "offset gap")
      case _ =>
    }
  }

  test("bpeTrain: local fast path and distributed loop — identical merge lists") {
    import spark.implicits._
    // localDictMax = 0 forces the distributed per-round loop;
    // Long.MaxValue forces the driver-local incremental trainer — the
    // two must agree merge for merge, including counts and the
    // (count desc, pair UTF-8 asc) tie-break, astral chars included
    val wordGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "é", "𝄞")).map(_.mkString))
    val corpusGen = Gen.chooseNum(3, 25).flatMap(n => Gen.listOfN(n, wordGen))
    val p = Prop.forAll(corpusGen) { words =>
      val df = words.map(Tuple1(_)).toDF("text")
      def run(localMax: Long) = Pipeline.bpeTrain(df, "text", 6,
          minPairCount = 2, localDictMax = localMax)
        .orderBy("merge_no").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      run(0L) == run(Long.MaxValue)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(r.passed, r.status.toString)
  }

  test("bpeVocab/bpeEncodeIds: ids round-trip to symbols; OOV encodes -1") {
    import spark.implicits._
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(Tuple1(_)).toDF("text")
    val mergesDf = Pipeline.bpeTrain(corpus, "text", 8, minPairCount = 2)
    val vocab = Pipeline.bpeVocab(corpus, "text", mergesDf)
    val v = vocab.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // ids are dense 0..V-1 over distinct symbols
    assert(v.keySet == (0 until v.size).toSet)
    assert(v.values.toSeq.distinct.size == v.size)
    // layout: base alphabet first, then merge outputs in rank order
    val mergeSyms = mergesDf.orderBy("merge_no").collect()
      .map(r => r.getString(1) + r.getString(2)).toSeq
    assert(v.toSeq.sortBy(_._1).map(_._2).takeRight(mergeSyms.size)
      == mergeSyms)
    assert(v.values.exists(_ == "</w>"))
    val docs = Seq((1L, "low newest"), (2L, "zz")).toDF("doc_id", "text")
    val enc = Pipeline.bpeEncodeIds(docs, "text", mergesDf, vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](r.fieldIndex("bpe_ids")),
          r.getLong(r.fieldIndex("n_bpe_tokens")))).toMap
    val seg = Pipeline.bpeSegment(docs, "text", mergesDf)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](r.fieldIndex("bpe_tokens"))).toMap
    // round-trip: ids map back to exactly bpeSegment's symbol stream
    assert(enc(1L)._1.map(v) == seg(1L))
    assert(enc(1L)._1.forall(_ >= 0))
    assert(enc.forall { case (k, (ids, n)) => n == ids.length })
    // 'z' was never in the training alphabet: its symbols encode -1,
    // the word marker still resolves
    assert(enc(2L)._1.count(_ == -1) ==
      seg(2L).count(s => s.nonEmpty && s.forall(_ == 'z')))
    assert(enc(2L)._1.last == v.find(_._2 == "</w>").get._1)
  }

  test("bpeEncodeIds composes with packSequences on real id counts") {
    import spark.implicits._
    val corpus = (Seq.fill(6)("aa bb aa") ++ Seq.fill(4)("aa cc"))
      .map(Tuple1(_)).toDF("text")
    val mergesDf = Pipeline.bpeTrain(corpus, "text", 4, minPairCount = 2)
    val vocab = Pipeline.bpeVocab(corpus, "text", mergesDf)
    val docs = Seq(
      (1L, "s0", "aa bb aa"), (2L, "s0", "aa cc"),
      (3L, "s1", "aa bb aa aa bb aa"), (4L, "s1", "cc"))
      .toDF("doc_id", "shard", "text")
    val toks = Pipeline.bpeEncodeIds(docs, "text", mergesDf, vocab)
    val packed = Pipeline.packSequences(toks, "doc_id", "shard",
      col("n_bpe_tokens"), contextLen = 8)
    val inOrder = packed.orderBy("tok_offset").collect()
      .map(r => (r.getLong(r.fieldIndex("tok_offset")),
        r.getLong(r.fieldIndex("tok"))))
    assert(inOrder.length == 4)
    inOrder.sliding(2).foreach {
      case Array((o1, n1), (o2, _)) => assert(o2 == o1 + n1, "offset gap")
      case _ =>
    }
  }

  test("packTokenIds: real BPE ids pack into training-ready chunks and round-trip") {
    import spark.implicits._
    val corpus = (Seq.fill(6)("aa bb aa") ++ Seq.fill(4)("aa cc"))
      .map(Tuple1(_)).toDF("text")
    val mergesDf = Pipeline.bpeTrain(corpus, "text", 4, minPairCount = 2)
    val vocab = Pipeline.bpeVocab(corpus, "text", mergesDf)
    val docs = Seq(
      (1L, "s0", "aa bb aa"), (2L, "s0", "aa cc"),
      (3L, "s1", "aa bb aa aa bb aa"), (4L, "s1", "cc"))
      .toDF("doc_id", "shard", "text")
    val toks = Pipeline.bpeEncodeIds(docs, "text", mergesDf, vocab)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sep = vocab.count().toInt // one past the dense id range
      val L = 8
      val packed = Pipeline.packTokenIds(toks, "doc_id", "shard",
        "bpe_ids", contextLen = L, sepId = sep).orderBy("chunk_id").collect()
      val ids = packed.map(_.getSeq[Int](2))
      // chunk ids are contiguous from 0; every chunk but the last is
      // exactly L tokens; the tail is non-empty
      assert(packed.map(_.getLong(0)).toSeq ==
        (0L until packed.length).toSeq)
      assert(ids.dropRight(1).forall(_.length == L),
        s"non-final chunks must be full: ${ids.map(_.length).toSeq}")
      assert(ids.last.nonEmpty && ids.last.length <= L)
      // the concatenated chunk stream IS the (shard, doc_id)-ordered
      // concat of each doc's ids + separator — the unpack contract
      val stream = ids.flatten.toSeq
      val docIds = toks.orderBy("shard", "doc_id").collect()
        .map(r => r.getSeq[Int](r.fieldIndex("bpe_ids")))
      assert(stream == docIds.flatMap(_ :+ sep).toSeq)
      // splitting on the separator recovers every document's id array
      val recovered = stream.foldLeft(List(Vector.empty[Int])) {
        case (acc, `sep`) => Vector.empty[Int] :: acc
        case (cur :: rest, t) => (cur :+ t) :: rest
        case (Nil, _) => fail("unreachable")
      }.reverse.dropRight(1) // trailing separator opens one empty tail
      assert(recovered.map(_.toSeq) == docIds.map(_.toSeq).toSeq)
      // ids are real BPE ids: every non-separator token is in-vocab
      assert(stream.filter(_ != sep).forall(t => t >= 0 && t < sep))
    } finally toks.unpersist()
  }

  test("packTokenIds property: stream conservation, full chunks, contiguous ids on random corpora") {
    import spark.implicits._
    // random doc/shard/id shapes — empty id arrays, docs longer than a
    // chunk, uneven shards: (1) the concatenated chunk stream equals
    // the (shard, doc)-ordered concat of docs + separators, (2) every
    // non-final chunk is exactly L, (3) chunk ids are 0..n-1
    val docGen = for {
      shard <- Gen.oneOf("s0", "s1", "s2")
      n <- Gen.chooseNum(0, 23)
      ids <- Gen.listOfN(n, Gen.chooseNum(0, 99))
    } yield (shard, ids)
    val corpusGen = for {
      nDocs <- Gen.chooseNum(1, 12)
      docs <- Gen.listOfN(nDocs, docGen)
      l <- Gen.chooseNum(1, 9)
    } yield (docs, l)
    val sep = -7
    val p = Prop.forAll(corpusGen) { case (docs, l) =>
      val df = docs.zipWithIndex.map { case ((sh, ids), i) =>
        (i.toLong, sh, ids.toArray)
      }.toDF("doc_id", "shard", "ids")
      val packed = operators.Pipeline.packTokenIds(df, "doc_id", "shard",
        "ids", contextLen = l, sepId = sep).orderBy("chunk_id").collect()
      val chunks = packed.map(_.getSeq[Int](2))
      val expected = docs.zipWithIndex
        .map { case ((sh, ids), i) => (sh, i.toLong, ids) }
        .sortBy { case (sh, i, _) => (sh, i) }
        .flatMap { case (_, _, ids) => ids :+ sep }
      val okStream = chunks.flatten.toSeq == expected
      val okFull = chunks.dropRight(1).forall(_.length == l) &&
        chunks.lastOption.forall(c => c.nonEmpty && c.length <= l)
      val okIds = packed.map(_.getLong(0)).toSeq ==
        (0L until packed.length).toSeq
      okStream && okFull && okIds
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  test("bpeTrain: leaves no persistent RDDs behind (round checkpoints released)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    sparkBpe(Seq.fill(4)("abc") ++ Seq.fill(2)("abd"), 4, minPairCount = 2)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"bpeTrain leaked persisted RDDs: $leaked")
  }

  // ---- unigram-LM tokenizer (Kudo 2018): the Viterbi kernel + the
  // hard-EM trainer. Reference role: exhaustive segmentation
  // enumeration (the p79 oracle's recursive-CTE strategy, in Scala).

  /** Every segmentation of `w` over `table` pieces (no UNK), with its
    * left-to-right score sum. */
  private def allSegs(w: String, table: Map[String, Double])
      : Seq[(List[String], Double)] = {
    if (w.isEmpty) return Seq((Nil, 0.0))
    (1 to w.length).flatMap { l =>
      val p = w.take(l)
      table.get(p).toSeq.flatMap { sc =>
        allSegs(w.drop(l), table).map { case (rest, rs) =>
          // left-to-right association: ((sc + r1) + r2) + … — rebuild
          // by summing the flat path in order, matching the DP and the
          // recursive CTE
          val path = p :: rest
          (path, path.map(table).foldLeft(0.0)(_ + _))
        }
      }
    }
  }

  test("unigram gate table is tie-free over the fixture vocabulary and " +
      "the kernel returns the unique argmax") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().map(_.getString(0)).sorted
    assert(vocab.nonEmpty)
    val table = graft.operators.Pipeline.UnigramGatePieces.toMap
    val jTable = new java.util.HashMap[String, java.lang.Double]()
    table.foreach { case (p, s) => jTable.put(p, Double.box(s)) }
    val maxLen = table.keys.map(_.length).max
    vocab.foreach { w =>
      val segs = allSegs(w, table)
      assert(segs.nonEmpty, s"'$w' not coverable by the gate table")
      val best = segs.map(_._2).max
      val winners = segs.filter(_._2 == best)
      assert(winners.size == 1,
        s"TIE in the gate table for '$w': ${winners.map(_._1)} — the " +
          "oracle's score-only ranking would be nondeterministic")
      val (ps, sc) = graft.plans.UnigramSegment.segmentLocal(
        w, jTable, maxLen, -1e9)
      assert(ps.toList == winners.head._1 && sc == best,
        s"kernel disagrees with exhaustive argmax on '$w'")
    }
  }

  test("unigram_segment kernel: longest-piece tie rule, UNK fallback, " +
      "empty word; codegen path agrees with segmentLocal") {
    import spark.implicits._
    val tie = new java.util.HashMap[String, java.lang.Double]()
    tie.put("a", Double.box(-1.0))
    tie.put("b", Double.box(-1.0))
    tie.put("ab", Double.box(-2.0))
    // 'ab' path and a+b path both score −2 → the longer piece wins
    val (tp, ts) = graft.plans.UnigramSegment.segmentLocal("ab", tie, 2, -99)
    assert(tp.toSeq == Seq("ab") && ts == -2.0)
    // UNK: '9' is not in the table — emitted as itself at unkScore,
    // and segmentation resumes with table pieces after it
    val (up, us) = graft.plans.UnigramSegment.segmentLocal("a9b", tie, 2, -50)
    assert(up.toSeq == Seq("a", "9", "b") && us == -52.0)
    assert(graft.plans.UnigramSegment.segmentLocal("", tie, 2, -50)
      ._1.isEmpty)
    // the codegen'd expression path returns the identical struct
    val enc = Seq("a -1.0", "b -1.0", "ab -2.0").mkString("\n")
    val rows = Seq("ab", "a9b", "ba").toDF("w")
      .select(call_function("unigram_segment", col("w"), lit(enc),
        lit(-50.0)).as("s"))
      .select(col("s.pieces"), col("s.score"))
      .collect()
      .map(r => (r.getSeq[String](0).toList, r.getDouble(1)))
    assert(rows.toSeq == Seq(
      (List("ab"), -2.0), (List("a", "9", "b"), -52.0),
      (List("b", "a"), -2.0)))
  }

  test("unigramTrain: deterministic, char coverage, vocab bound, and " +
      "trained segmentation round-trips") {
    import spark.implicits._
    val corpus = (Seq.fill(20)("tokenizer") ++ Seq.fill(12)("token") ++
      Seq.fill(8)("sizer") ++ Seq("ize"))
      .map(Tuple1(_)).toDF("body")
    def train() = graft.operators.Pipeline
      .unigramTrain(corpus, "body", vocabSize = 12, iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    val v = train()
    // rerun-deterministic (driver-local loop, quantized scores)
    assert(train().toSeq == v.toSeq)
    val pieces = v.map(_._1).toSet
    // every training character survives pruning unconditionally
    assert("tokenizer".toSet.map((c: Char) => c.toString).subsetOf(pieces))
    assert(v.length <= 12)
    // the dominant subword is among the kept multi-char pieces
    assert(pieces.exists(p => p.length > 1 && "tokenizer".contains(p)))
    // serving with the trained table reconstructs every word exactly
    val seg = graft.operators.Pipeline.unigramSegment(
      corpus.distinct().withColumn("k", lit(1L)), "k", "body",
      v.toSeq.toDF("piece", "score"))
      .collect()
    assert(seg.nonEmpty)
    seg.foreach { r =>
      assert(r.getAs[String]("seg").replace("+", "") ==
        r.getAs[String]("word"))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Pipeline.unigramTrain(corpus, "body", 0)
    }
  }

  // ---- WordPiece (Wu 2016 / Schuster & Nakajima 2012): the greedy
  // kernel + the likelihood-objective trainer.

  test("wordpiece_segment kernel: greedy longest match, ## convention, " +
      "whole-word UNK, over-length UNK, no backtracking; codegen path " +
      "agrees") {
    import spark.implicits._
    def jv(ps: String*): java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      ps.foreach(s.add)
      s
    }
    def seg(w: String, v: java.util.HashSet[String],
        maxChars: Int = 200): List[String] =
      // maxLen only bounds the scan — any value ≥ the longest piece
      // body is equivalent; 8 covers every vocab in this test
      graft.plans.WordpieceSegment.segmentLocal(w, v, 8, maxChars).toList
    val v1 = jv("ab", "abc", "a", "c", "##b", "##c", "##bc")
    // longest start match wins ("abc" over "ab" over "a")
    assert(seg("abc", v1) == List("abc"))
    // continuation pieces require ##; longest continuation wins
    assert(seg("cbc", v1) == List("c", "##bc"))
    // a start-only piece never matches mid-word: "abab" is a + ... but
    // pos 1 has only ##b, and then 'a' again has no ##a → whole-word UNK
    assert(seg("abab", v1) == List("[UNK]"))
    // unmatchable position → the WHOLE word is [UNK]
    assert(seg("abd", v1) == List("[UNK]"))
    // over-length words are [UNK] outright (code-point count)
    assert(seg("abc", v1, maxChars = 2) == List("[UNK]"))
    assert(seg("", v1).isEmpty)
    // NO backtracking: greedy takes "abcd" and strands at 'e', even
    // though a + ##bc + ##de segments the word — the BERT is_bad rule
    val corner = jv("abcd", "a", "##bc", "##de")
    assert(seg("abcde", corner) == List("[UNK]"))
    // supplementary chars are ONE position: never split mid-surrogate,
    // counted once against maxInputChars
    val astral = jv("𝄞", "##a")
    assert(seg("𝄞a", astral, maxChars = 2) ==
      List("𝄞", "##a"))
    // the codegen'd expression path returns the identical pieces
    // ('b' exists only as a ##-continuation, so the bare word is UNK)
    val enc = Seq("ab", "abc", "a", "c", "##b", "##c", "##bc").mkString("\n")
    val rows = Seq("abc", "cbc", "abd", "b").toDF("w")
      .select(call_function("wordpiece_segment", col("w"), lit(enc),
        lit(200)).as("p"))
      .collect().map(_.getSeq[String](0).toList)
    assert(rows.toSeq == Seq(List("abc"), List("c", "##bc"),
      List("[UNK]"), List("[UNK]")))
  }

  test("wordpieceTrain: likelihood objective picks a different pair " +
      "than BPE's count objective; merges verified by hand") {
    import spark.implicits._
    // 'xy' x5 drives the COUNT argmax (pair count 5), but x appears 15
    // times overall so its likelihood gain 5/(15*5) = 1/15 loses to
    // (a,##b): 3/(3*3) = 1/3 — WordPiece must merge ab first, then xy
    val corpus = (Seq.fill(5)("xy") ++ Seq.fill(3)("ab") ++
      Seq.fill(10)("x") ++ Seq.fill(10)("y"))
      .map(Tuple1(_)).toDF("body")
    def train() = graft.operators.Pipeline
      .wordpieceTrain(corpus, "body", numMerges = 4, minPairCount = 2)
      .orderBy("merge_no").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val got = train()
    assert(train() == got)                      // rerun-deterministic
    assert(got == Seq(
      (1, "a", "##b", "ab", 3L),
      (2, "x", "##y", "xy", 5L)))               // nothing else reaches 2
    // the count argmax (BPE's pick) is NOT the first wordpiece merge
    assert(got.head._5 < 5L)
    intercept[IllegalArgumentException] {
      graft.operators.Pipeline.wordpieceTrain(corpus, "body", 0)
    }
  }

  test("wordpieceTrain tie-break: equal likelihood falls to pair count, " +
      "then UTF-8 pair order") {
    import spark.implicits._
    // aba x2 + ab x1: unit a=3, ##b=3, ##a=2; pairs (a,##b)=3 at
    // 3/(3*3)=1/3 and (##b,##a)=2 at 2/(3*2)=1/3 — a SCORE tie; the
    // higher pair count must win
    val corpus = (Seq.fill(2)("aba") ++ Seq("ab"))
      .map(Tuple1(_)).toDF("body")
    val got = graft.operators.Pipeline
      .wordpieceTrain(corpus, "body", numMerges = 1, minPairCount = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(("a", "##b", "ab")))
  }

  test("wordpieceVocab + wordpieceSegment: trained model round-trips " +
      "its corpus with zero UNKs") {
    import spark.implicits._
    val corpus = (Seq.fill(6)("hugging") ++ Seq.fill(4)("hugs") ++
      Seq.fill(3)("gugs") ++ Seq.fill(2)("hug"))
      .map(Tuple1(_)).toDF("body")
    val merges = graft.operators.Pipeline
      .wordpieceTrain(corpus, "body", numMerges = 6, minPairCount = 2)
    val vocab = graft.operators.Pipeline
      .wordpieceVocab(corpus, "body", merges)
    val pieces = vocab.collect().map(_.getString(0)).toSet
    // base convention: initial chars raw, continuations ##-prefixed
    assert(pieces.contains("h") && pieces.contains("##u") &&
      pieces.contains("g"))
    val segd = graft.operators.Pipeline.wordpieceSegment(
      corpus.distinct().withColumn("k", lit(1L)), "k", "body", vocab)
      .collect()
    assert(segd.nonEmpty)
    segd.foreach { r =>
      assert(!r.getAs[Boolean]("is_unk"),
        s"UNK on training word ${r.getAs[String]("word")}")
      assert(r.getAs[String]("seg").replace("+", "").replace("##", "")
        == r.getAs[String]("word"))
      assert(r.getAs[Long]("n_pieces") >= 1L)
    }
    // trained multi-char pieces actually serve (not just singles):
    // 'hugging' (7 chars) must segment in fewer than 7 pieces — its
    // (##i,##n) pair is round 1's likelihood argmax (6/(6·6) = 1/6
    // beats every other pair's ≤ 1/15)
    assert(segd.find(r => r.getAs[String]("word") == "hugging").get
      .getAs[Long]("n_pieces") < 7L)
  }

  test("WordpieceGateVocab over the fixture corpus: exactly the two " +
      "designed UNKs, everything else reassembles; greedy picks pinned") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val segd = graft.operators.Pipeline.wordpieceSegment(
      docs, "doc_id", "text",
      graft.operators.Pipeline.WordpieceGateVocab.toDF("piece"),
      maxInputChars = 7)
      .select("word", "seg", "is_unk").distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(segd.nonEmpty)
    val unks = segd.filter(_._3).map(_._1).toSet
    // 'spark' (no ##k continuation) and 'customer' (8 > 7 chars) are
    // the two designed UNK exercises — and the ONLY UNKs
    assert(unks == Set("spark", "customer"))
    segd.filterNot(_._3).foreach { case (w, s, _) =>
      assert(s.replace("+", "").replace("##", "") == w)
    }
    val bySeg = segd.map(x => (x._1, x._2)).toMap
    assert(bySeg("table") == "table")           // whole word beats "tab"
    assert(bySeg("stream") == "str+##eam")      // "##eam" beats "##ea"
    assert(bySeg("value") == "val+##ue")
    assert(bySeg("query") == "q+##uery")
    assert(bySeg("merge") == "merg+##e")
  }
}
