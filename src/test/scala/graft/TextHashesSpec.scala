package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The codegen'd md5-prefix text-hash kernels (plans.TextHashes) must be
  * VALUE-IDENTICAL to the Column spellings they replace — that identity
  * is what keeps every DuckDB oracle (which computes
  * `CAST('0x' || substr(md5(s), 1, 2n) AS BIGINT)`) valid after the
  * swap, so it is property-tested here over adversarial strings
  * (unicode, empties, embedded quotes/backslashes). Each scalacheck
  * trial ships a BATCH of rows through one DataFrame so the property
  * runs exercise whole-stage codegen without paying per-row job setup.
  */
class TextHashesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: Prop, trials: Int = 12): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(trials), p)
    assert(r.passed, r.status.toString)
  }

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("", "a", "naïve", "日本語", "x\\y", "\"q\"", "tab\tchar"))
  private val wsGen: Gen[List[String]] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, wordGen))
  // duplicate-heavy arrays so distinctness and first-occurrence order are
  // genuinely exercised by the k-gram kernels
  private val dupGen: Gen[List[String]] = Gen.chooseNum(5, 15).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("a", "b", "日", "d")))
  private val batchGen: Gen[List[List[String]]] =
    Gen.listOfN(6, Gen.oneOf(wsGen, dupGen))

  test("md5_prefix_long: matches conv(substring(md5)) at widths 2/4/6") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(12, wordGen)) { ss =>
      val df = ss.toDF("s")
      Seq(2, 4, 6).forall { nBytes =>
        val got = df.select(
          call_function("md5_prefix_long", col("s"), lit(nBytes))).collect()
        val want = df.select(
          conv(substring(md5(col("s")), 1, 2 * nBytes), 16, 10)
            .cast(LongType)).collect()
        got.map(_.getLong(0)).toSeq == want.map(_.getLong(0)).toSeq
      }
    })
  }

  test("md5_prefix_array: matches per-element transform; nulls stay null") {
    import spark.implicits._
    check(Prop.forAll(batchGen) { batch =>
      val df = batch.toDF("ws")
      val got = df.select(
        call_function("md5_prefix_array", col("ws"), lit(6))).collect()
      val want = df.select(
        transform(col("ws"),
          w => conv(substring(md5(w), 1, 12), 16, 10).cast(LongType)))
        .collect()
      got.map(_.getSeq[Long](0)).toSeq == want.map(_.getSeq[Long](0)).toSeq
    })
    // null element and null array propagate like the transform spelling
    val df = Seq(Some(Seq(Some("a"), None)), None).toDF("ws")
    val rows = df.select(
      call_function("md5_prefix_array", col("ws"), lit(6))).collect()
    val s0 = rows(0).getSeq[Any](0)
    assert(s0.length == 2 && s0(0) != null && s0(1) == null)
    assert(rows(1).isNullAt(0))
  }

  test("kgram_hashes: matches array_distinct(transform(...)) incl. order") {
    import spark.implicits._
    check(Prop.forAll(batchGen) { batch =>
      val df = batch.filter(_.size >= 5).toDF("ws")
      val got = df.select(
        call_function("kgram_hashes", col("ws"), lit(5), lit(4))).collect()
      val want = df.select(
        array_distinct(transform(sequence(lit(1), size(col("ws")) - 4),
          i => conv(substring(md5(array_join(slice(col("ws"), i, lit(5)), " ")),
            1, 8), 16, 10).cast(LongType)))).collect()
      got.map(_.getSeq[Long](0)).toSeq == want.map(_.getSeq[Long](0)).toSeq
    })
  }

  test("kgram_hashes_all: matches transform(...) with repeats kept, in order") {
    import spark.implicits._
    check(Prop.forAll(batchGen) { batch =>
      val df = batch.filter(_.size >= 2).toDF("ws")
      Seq(1, 2).forall { k =>
        val got = df.select(
          call_function("kgram_hashes_all", col("ws"), lit(k), lit(6))).collect()
        val want = df.select(
          transform(sequence(lit(1), size(col("ws")) - (k - 1)),
            i => conv(substring(md5(array_join(slice(col("ws"), i, lit(k)), " ")),
              1, 12), 16, 10).cast(LongType))).collect()
        got.map(_.getSeq[Long](0)).toSeq == want.map(_.getSeq[Long](0)).toSeq
      }
    })
    // the dedup sibling drops repeats; this kernel must keep them
    val rep = Seq(Seq("a", "b", "a", "b")).toDF("ws")
    assert(rep.select(call_function("kgram_hashes_all", col("ws"), lit(2), lit(6)))
      .collect()(0).getSeq[Long](0).length == 3)
    assert(rep.select(call_function("kgram_hashes", col("ws"), lit(2), lit(6)))
      .collect()(0).getSeq[Long](0).length == 2)
  }

  test("kgram_roll_hashes_all: matches the BigInt polynomial reference") {
    import spark.implicits._
    import graft.plans.TextHashes
    // the O(1)-slide Mersenne arithmetic against a direct BigInt
    // evaluation of H(p) = Σ md5_48(w[p+j])·B^(k-1-j) mod (2^61-1) —
    // any mulMod61/fold defect shows immediately
    val P = BigInt(TextHashes.MersenneP)
    val B = BigInt(TextHashes.RollBase)
    def wordHash(s: String): BigInt = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 6).foldLeft(BigInt(0))((a, i) => (a << 8) | BigInt(d(i) & 0xff))
    }
    check(Prop.forAll(batchGen) { batch =>
      Seq(1, 3, 5).forall { k =>
        val got = batch.toDF("ws")
          .select(call_function("kgram_roll_hashes_all", col("ws"), lit(k)))
          .collect().map(_.getSeq[Long](0)).toSeq
        val want = batch.map { ws =>
          if (ws.size < k) Seq.empty[Long]
          else (0 to ws.size - k).map { p =>
            (0 until k).map(j =>
              wordHash(ws(p + j)) * B.modPow(BigInt(k - 1 - j), P) % P)
              .sum % P
          }.map(_.toLong)
        }
        got == want
      }
    })
    // interpreted eval ≡ the same reference on one concrete shape
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val ref = BoundReference(0, ArrayType(StringType), nullable = true)
    val expr = graft.plans.KgramRollHashesAll(ref, 2)
    val ws = Seq("a", "b", "a")
    val out = expr.eval(InternalRow(new GenericArrayData(
        ws.map(UTF8String.fromString).toArray)))
      .asInstanceOf[GenericArrayData].toLongArray().toSeq
    val exp = (0 to 1).map { p =>
      ((wordHash(ws(p)) * B + wordHash(ws(p + 1))) % P).toLong
    }
    assert(out == exp)
    // identical windows roll to identical hashes; short arrays empty
    assert(out.toSet.size == 2) // "a b" vs "b a" differ (order matters)
    assert(expr.eval(InternalRow(new GenericArrayData(
      Array[Any](UTF8String.fromString("x")))))
      .asInstanceOf[GenericArrayData].numElements() == 0)
  }

  test("kgram_strings: matches array_distinct(transform(array_join)) incl. order") {
    import spark.implicits._
    check(Prop.forAll(batchGen) { batch =>
      val df = batch.filter(_.size >= 5).toDF("ws")
      val got = df.select(
        call_function("kgram_strings", col("ws"), lit(5))).collect()
      val want = df.select(
        array_distinct(transform(sequence(lit(1), size(col("ws")) - 4),
          i => array_join(slice(col("ws"), i, lit(5)), " ")))).collect()
      got.map(_.getSeq[String](0)).toSeq == want.map(_.getSeq[String](0)).toSeq
    })
  }

  test("chargram_strings: matches array_distinct(transform(substr)) incl. order") {
    import spark.implicits._
    val textGen = Gen.oneOf(
      // 1/2/3/4-byte UTF-8 (🎄 is a 4-byte surrogate pair — exercises
      // the chargram boundary table's 4-byte branch AND Spark's
      // code-point length semantics agreeing with it)
      Gen.listOfN(20, Gen.oneOf("a", "b", "ø", "日", "🎄", " ")).map(_.mkString),
      Gen.alphaNumStr.map(_.take(30)),
      Gen.oneOf("", "ab", "日本語です、とても良い", "a🎄b🎄c🎄d", "aaaaaaa"))
    check(Prop.forAll(Gen.listOfN(8, textGen)) { ts =>
      val df = ts.toDF("t")
      val got = df.select(
        call_function("chargram_strings", col("t"), lit(3))).collect()
      val want = df.select(when(length(col("t")) >= 3,
        array_distinct(transform(sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3)))))
        .otherwise(array().cast("array<string>"))).collect()
      got.map(_.getSeq[String](0)).toSeq == want.map(_.getSeq[String](0)).toSeq
    })
  }

  test("chargram_strings: invalid UTF-8 walks numChars-consistently, no crash") {
    import org.apache.spark.unsafe.types.UTF8String
    // parquet/JSONL string columns are not validated UTF-8; the byte
    // walk must use UTF8String's own advance table (invalid lead bytes
    // count as ONE char in numChars) or it reads past the array
    val cont = UTF8String.fromBytes(Array.fill(5)(0xBF.toByte)) // bare continuations
    val g1 = graft.plans.TextHashes.chargramStrings(cont, 3)
    assert(g1.numElements() == 1) // 3 identical windows of 0xBF×3 → 1 distinct
    // a truncated multi-byte lead at the end of the buffer
    val trunc = UTF8String.fromBytes("ab".getBytes("UTF-8") :+ 0xE2.toByte)
    val g2 = graft.plans.TextHashes.chargramStrings(trunc, 2)
    assert(g2.numElements() == trunc.numChars() - 1)
    // overlong/stray leads mixed with ASCII
    val mixed = UTF8String.fromBytes(
      Array[Byte]('x'.toByte, 0xFF.toByte, 'y'.toByte, 0x80.toByte, 'z'.toByte))
    val g3 = graft.plans.TextHashes.chargramStrings(mixed, 2)
    assert(g3.numElements() > 0) // walks the full buffer without throwing
  }

  test("kgram kernels: arrays shorter than k yield empty; null yields null") {
    import spark.implicits._
    val df = Seq(Some(Seq("a", "b")), None).toDF("ws")
    val h = df.select(call_function("kgram_hashes", col("ws"), lit(5), lit(4)),
      call_function("kgram_strings", col("ws"), lit(5))).collect()
    assert(h(0).getSeq[Long](0).isEmpty && h(0).getSeq[String](1).isEmpty)
    assert(h(1).isNullAt(0) && h(1).isNullAt(1))
  }

  test("null elements: kgram kernels follow array_join skip; sig kernels skip votes") {
    import spark.implicits._
    // the kernels are registered session-wide, so null elements must be
    // well-defined even though the pipeline never produces them
    val ws = Seq(Some(Seq(Some("a"), None, Some("b"), Some("c"), Some("d"), Some("e"))))
      .toDF("ws")
    val got = ws.select(
      call_function("kgram_strings", col("ws"), lit(5))).collect()(0).getSeq[String](0)
    val want = ws.select(
      array_distinct(transform(sequence(lit(1), size(col("ws")) - 4),
        i => array_join(slice(col("ws"), i, lit(5)), " ")))).collect()(0).getSeq[String](0)
    assert(got == want) // "a b c d" (null skipped, no double separator)
    val gotH = ws.select(
      call_function("kgram_hashes", col("ws"), lit(5), lit(4))).collect()(0).getSeq[Long](0)
    val wantH = ws.select(
      array_distinct(transform(sequence(lit(1), size(col("ws")) - 4),
        i => conv(substring(md5(array_join(slice(col("ws"), i, lit(5)), " ")),
          1, 8), 16, 10).cast(LongType)))).collect()(0).getSeq[Long](0)
    assert(gotH == wantH)

    // minhash_sig: null elements skipped like array_min over a
    // null-mapped transform; simhash_fp: null tokens cast no vote
    val xs = Seq(Seq(Some(17L), None, Some(99999L))).toDF("xs")
    val sigNull = xs.select(call_function("minhash_sig", col("xs"), lit(4)))
      .collect()(0).getSeq[Long](0)
    val sigDense = Seq(Seq(17L, 99999L)).toDF("xs")
      .select(call_function("minhash_sig", col("xs"), lit(4)))
      .collect()(0).getSeq[Long](0)
    assert(sigNull == sigDense)
    val fpNull = xs.select(call_function("simhash_fp", col("xs"), lit(48)))
      .collect()(0).getLong(0)
    val fpDense = Seq(Seq(17L, 99999L)).toDF("xs")
      .select(call_function("simhash_fp", col("xs"), lit(48)))
      .collect()(0).getLong(0)
    assert(fpNull == fpDense)
  }

  test("minhash_sig rejects out-of-range n and >32-bit elements with guidance") {
    import spark.implicits._
    val e1 = intercept[Exception] {
      Seq(Seq(1L)).toDF("xs")
        .select(call_function("minhash_sig", col("xs"), lit(0))).collect()
    }
    assert(e1.getMessage.contains("[1, 64]"))
    val e2 = intercept[Exception] {
      Seq(Seq(1L << 40)).toDF("xs")
        .select(call_function("minhash_sig", col("xs"), lit(4))).collect()
    }
    assert(e2.getMessage.contains("32 bits"))
  }

  test("interpreted eval agrees with codegen for all four kernels") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    // the DataFrame path above exercises codegen (whole-stage);
    // here the same inputs run through interpreted eval()
    val words = Seq("the", "quick", "brown", "fox", "jumps", "over",
      "the", "quick", "brown", "fox")
    val ws: Array[Any] = words.map(UTF8String.fromString).toArray
    val arr = new GenericArrayData(ws)
    val sRef = BoundReference(0, StringType, nullable = true)
    val aRef = BoundReference(0, ArrayType(StringType), nullable = true)

    val one = graft.plans.Md5PrefixLong(sRef, 6)
      .eval(InternalRow(UTF8String.fromString("quick"))).asInstanceOf[Long]
    val oneDf = Seq("quick").toDF("s")
      .select(call_function("md5_prefix_long", col("s"), lit(6)))
      .collect()(0).getLong(0)
    assert(one == oneDf)

    val harr = graft.plans.Md5PrefixArray(aRef, 6)
      .eval(InternalRow(arr)).asInstanceOf[GenericArrayData]
    val harrDf = Seq(words).toDF("ws")
      .select(call_function("md5_prefix_array", col("ws"), lit(6)))
      .collect()(0).getSeq[Long](0)
    assert(harr.toArray[Any](LongType).map(_.asInstanceOf[Long]).toSeq == harrDf)

    val kh = graft.plans.KgramHashes(aRef, 5, 4)
      .eval(InternalRow(arr)).asInstanceOf[GenericArrayData]
    val khDf = Seq(words).toDF("ws")
      .select(call_function("kgram_hashes", col("ws"), lit(5), lit(4)))
      .collect()(0).getSeq[Long](0)
    assert(kh.toLongArray().toSeq == khDf)

    val ks = graft.plans.KgramStrings(aRef, 5)
      .eval(InternalRow(arr)).asInstanceOf[GenericArrayData]
    val ksDf = Seq(words).toDF("ws")
      .select(call_function("kgram_strings", col("ws"), lit(5)))
      .collect()(0).getSeq[String](0)
    assert(ks.toArray[Any](StringType).map(_.toString).toSeq == ksDf)
  }

  test("word_spans: substr over each span recovers exactly the split tokens") {
    import spark.implicits._
    // the oracle is Spark's own substring + split: for every span,
    // substr(s, start+1, end-start) must yield the corresponding token
    // of array_remove(split(s, \s+), "") — over adversarial strings
    // (unicode words, tabs INSIDE generated words, empty words that
    // merge separator runs, leading/trailing whitespace)
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "\r\n", "")
    val docGen: Gen[String] = for {
      n <- Gen.chooseNum(0, 8)
      ws <- Gen.listOfN(n, wordGen)
      seps <- Gen.listOfN(n + 1, sepGen)
    } yield seps.head + ws.zip(seps.tail).map { case (w, s) => w + s }.mkString
    check(Prop.forAll(Gen.listOfN(10, docGen)) { ss =>
      val df = ss.toDF("s")
      val rows = df.select(
        transform(call_function("word_spans", col("s")), sp =>
          substr(col("s"), shiftright(sp, 32) + 1,
            sp.bitwiseAND(lit(0xFFFFFFFFL)) - shiftright(sp, 32))).as("toks"),
        array_remove(split(col("s"), "\\s+"), "").as("want")).collect()
      rows.forall(r => r.getSeq[String](0) == r.getSeq[String](1))
    })
    // U+00A0 (no-break space) is NOT a separator — split's \s is ASCII
    val nb = Seq("a\u00A0b c").toDF("s").select(
      transform(call_function("word_spans", col("s")), sp =>
        substr(col("s"), shiftright(sp, 32) + 1,
          sp.bitwiseAND(lit(0xFFFFFFFFL)) - shiftright(sp, 32))))
      .collect()(0).getSeq[String](0)
    assert(nb == Seq("a\u00A0b", "c"))
    // empty / all-whitespace strings span nothing
    assert(Seq("", " \t\n ").toDF("s")
      .select(size(call_function("word_spans", col("s")))).collect()
      .forall(_.getInt(0) == 0))
  }

  test("any_in_sorted: matches arrays_overlap on sorted sets; eval ≡ codegen") {
    import spark.implicits._
    // membership oracle: for a sorted, distinct, null-free set side and
    // a null-free probe side, any_in_sorted is exactly arrays_overlap
    val setGen = Gen.chooseNum(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50L, 50L))).map(_.distinct.sorted)
    val probeGen = Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50L, 50L)))
    check(Prop.forAll(Gen.listOfN(8, Gen.zip(probeGen, setGen))) { batch =>
      val df = batch.toDF("probe", "sset")
      val got = df.select(
        call_function("any_in_sorted", col("probe"), col("sset"))).collect()
      val want = df.select(
        coalesce(arrays_overlap(col("probe"), col("sset")), lit(false)))
        .collect()
      got.map(_.getBoolean(0)).toSeq == want.map(_.getBoolean(0)).toSeq
    })
    // interpreted eval on the same shapes codegen answered above
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.ArrayType
    val lRef = BoundReference(0, ArrayType(LongType), nullable = true)
    val rRef = BoundReference(1, ArrayType(LongType), nullable = true)
    val expr = graft.plans.AnyInSorted(lRef, rRef)
    def ga(xs: Any*) = new GenericArrayData(xs.toArray)
    assert(expr.eval(InternalRow(ga(7L, 3L), ga(1L, 3L, 9L))) == true)
    assert(expr.eval(InternalRow(ga(7L, 4L), ga(1L, 3L, 9L))) == false)
    // empties and null probe ELEMENTS are misses, never matches
    assert(expr.eval(InternalRow(ga(), ga(1L))) == false)
    assert(expr.eval(InternalRow(ga(1L), ga())) == false)
    assert(expr.eval(InternalRow(ga(null, 9L), ga(1L, 3L, 9L))) == true)
    assert(expr.eval(InternalRow(ga(null), ga(1L))) == false)
    // null INPUT arrays are null, like every null-intolerant expression
    assert(expr.eval(InternalRow(null, ga(1L))) == null)
  }

  test("positions_in_sorted: matches the filter/transform spelling; eval ≡ codegen") {
    import spark.implicits._
    // positional oracle: the Column spelling keeps each probe INDEX
    // whose element is in the set — exactly the kernel's contract —
    // with null probe elements never matching (when() with no
    // otherwise leaves them null; the filter drops them)
    val setGen = Gen.chooseNum(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50L, 50L))).map(_.distinct.sorted)
    val probeGen = Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50L, 50L)))
    check(Prop.forAll(Gen.listOfN(8, Gen.zip(probeGen, setGen))) { batch =>
      val df = batch.toDF("probe", "sset")
      val got = df.select(
        call_function("positions_in_sorted", col("probe"), col("sset")))
        .collect()
      val want = df.select(
        filter(transform(col("probe"), (x, i) =>
          when(array_contains(col("sset"), x), i)), e => e.isNotNull)
          .cast("array<int>"))
        .collect()
      got.map(_.getSeq[Int](0)).toSeq == want.map(_.getSeq[Int](0)).toSeq
    })
    // interpreted eval on the same shapes codegen answered above
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.ArrayType
    val lRef = BoundReference(0, ArrayType(LongType), nullable = true)
    val rRef = BoundReference(1, ArrayType(LongType), nullable = true)
    val expr = graft.plans.PositionsInSorted(lRef, rRef)
    def ga(xs: Any*) = new GenericArrayData(xs.toArray)
    def positions(v: Any): Seq[Int] =
      v.asInstanceOf[GenericArrayData].toIntArray().toSeq
    assert(positions(expr.eval(InternalRow(ga(7L, 3L, 9L), ga(1L, 3L, 9L))))
      == Seq(1, 2))
    assert(positions(expr.eval(InternalRow(ga(7L, 4L), ga(1L, 3L, 9L)))).isEmpty)
    // repeats in the probe report EVERY matching position
    assert(positions(expr.eval(InternalRow(ga(3L, 3L), ga(1L, 3L)))) == Seq(0, 1))
    // empties and null probe ELEMENTS are misses, never matches
    assert(positions(expr.eval(InternalRow(ga(), ga(1L)))).isEmpty)
    assert(positions(expr.eval(InternalRow(ga(1L), ga()))).isEmpty)
    assert(positions(expr.eval(InternalRow(ga(null, 9L), ga(1L, 3L, 9L))))
      == Seq(1))
    // null INPUT arrays are null, like every null-intolerant expression
    assert(expr.eval(InternalRow(null, ga(1L))) == null)
  }

  // ---- r19 fused feature kernels: each must be ROW-identical to the
  // explode → hash → pmod → groupBy pipeline it replaced (that pipeline
  // is what the p62/p72/p126 DuckDB oracles replay, so this identity is
  // what keeps those gates valid after the fusion).

  test("kgram_bucket_counts: explode(kernel) == old explode/groupBy/totals") {
    import spark.implicits._
    check(Prop.forAll(batchGen) { batch =>
      val df = batch.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
        .toDF("id", "ws")
      val got = df.select(col("id"),
          explode(call_function("kgram_bucket_counts", col("ws"),
            lit(2), lit(64), lit(6))).as("e"))
        .select(col("id"), col("e.b"), col("e.cnt"), col("e.doc_grams"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val rows = df.select(col("id"),
          explode(flatten(array(
            call_function("kgram_hashes_all", col("ws"), lit(1), lit(6)),
            call_function("kgram_hashes_all", col("ws"), lit(2), lit(6)))))
            .as("h"))
        .withColumn("b", pmod(col("h"), lit(64L)))
        .groupBy(col("id"), col("b")).agg(count(lit(1)).as("cnt"))
      val totals = rows.groupBy(col("id")).agg(sum(col("cnt")).as("dg"))
      val want = rows.join(totals, Seq("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      got == want
    })
  }

  test("chargram_bucket_counts: explode(kernel) == old explode/groupBy/totals") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(8, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(20)),
      Gen.oneOf("", "ab", "naïve café", "日本語テキスト", "aaaaaaa",
        "x\\y\"q\"", "tab\tchar newline\nend")))) { ss =>
      val df = ss.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val got = df.select(col("id"),
          explode(call_function("chargram_bucket_counts", col("t"),
            lit(1), lit(3), lit(32), lit(6))).as("e"))
        .select(col("id"), col("e.b"), col("e.cnt"), col("e.doc_grams"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val rows = df.select(col("id"),
          explode(flatten(array((1 to 3).map(k =>
            call_function("chargram_strings", col("t"), lit(k))): _*)))
            .as("g"))
        .withColumn("b",
          pmod(call_function("md5_prefix_long", col("g"), lit(6)), lit(32L)))
        .groupBy(col("id"), col("b")).agg(count(lit(1)).as("cnt"))
      val totals = rows.groupBy(col("id")).agg(sum(col("cnt")).as("dg"))
      val want = rows.join(totals, Seq("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      got == want
    })
  }

  test("hashed_embedding_vec: explode(kernel) == old cells/map/normalize") {
    import spark.implicits._
    val dim = 16
    check(Prop.forAll(batchGen) { batch =>
      val df = batch.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
        .toDF("id", "ws")
      val got = df.select(col("id"),
          explode(call_function("hashed_embedding_vec", col("ws"), lit(dim)))
            .as("emb"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toSet
      // the pre-r19 pipeline spelling, verbatim (explode → single-hash
      // bucket+sign → (id, b) sum → map assembly → dense + normalize)
      val cells = df
        .select(col("id"), explode(col("ws")).as("w"))
        .select(col("id"),
          call_function("md5_prefix_long", col("w"), lit(4)).as("h"))
        .select(col("id"), (col("h") % dim.toLong).as("b"),
          when(shiftright(col("h"), 31) === 0, 1L).otherwise(-1L).as("s"))
        .groupBy(col("id"), col("b")).agg(sum(col("s")).as("v"))
      val want = cells.groupBy(col("id"))
        .agg(map_from_entries(collect_list(struct(col("b"), col("v"))))
          .as("m"))
        .select(col("id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => coalesce(element_at(col("m"), i.cast(LongType)), lit(0L)))
            .as("raw"))
        .withColumn("n2",
          aggregate(col("raw"), lit(0L), (a, x) => a + x * x))
        .select(col("id"),
          transform(col("raw"), v =>
            when(col("n2") === 0L, lit(0f))
              .otherwise((v.cast("double") /
                sqrt(col("n2").cast("double"))).cast("float"))).as("emb"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toSet
      got == want
    })
  }

  test("type mismatches are rejected with the kernel name") {
    import spark.implicits._
    val e1 = intercept[Exception] {
      Seq(1).toDF("s")
        .select(call_function("md5_prefix_long", col("s"), lit(4))).collect()
    }
    assert(e1.getMessage.contains("md5_prefix_long"))
    val e2 = intercept[Exception] {
      Seq(Seq(1L)).toDF("ws")
        .select(call_function("kgram_hashes", col("ws"), lit(5), lit(4))).collect()
    }
    assert(e2.getMessage.contains("kgram_hashes"))
  }
}
