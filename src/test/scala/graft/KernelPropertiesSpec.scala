package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

/** ScalaCheck properties for the r16 codegen kernels, checked through
  * the REGISTERED SQL functions (so the whole inject->codegen path is
  * under test, not just the static helpers). */
class KernelPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: Prop, n: Int = 30): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  test("outer_upper: packed products equal the direct i<=j model") {
    import spark.implicits._
    val gen = Gen.chooseNum(1, 12).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-8f, 8f)))
    check(Prop.forAll(gen) { (xs: List[Float]) =>
      val d = xs.length
      val out = Seq(Tuple1(xs)).toDF("v")
        .select(call_function("outer_upper", col("v")))
        .collect().head.getSeq[Double](0)
      val want = for { i <- 0 until d; j <- i until d }
        yield xs(i).toDouble * xs(j).toDouble
      out == want
    }, n = 20)
  }

  test("outer_upper: oversized input fails loudly, not NegativeArraySizeException") {
    val big = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Float](65536))
    val e = intercept[IllegalArgumentException] {
      graft.plans.OuterUpper.packed(big)
    }
    assert(e.getMessage.contains("65535"))
  }

  test("outer_upper: packed size is computed in Long — the Int expression " +
      "wraps negative for d in [46341, 65535], inside the accepted bound") {
    import graft.plans.OuterUpper.packedSize
    // the hole the Long fix closes: d*(d+1)/2 in Int arithmetic goes
    // negative exactly at 46341 (the allocation would have thrown
    // NegativeArraySizeException even though the require passed)
    val d = 46341
    assert(d * (d + 1) / 2 < 0)
    assert(packedSize(d) == 1073767311L)
    // at the accepted cap the Long size still fits an Int array
    assert(packedSize(65535) == 2147450880L)
    assert(packedSize(65535) <= Int.MaxValue.toLong)
    // the allocation path consumes packedSize: a direct probe agrees
    val small = 512
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Float](small))
    assert(graft.plans.OuterUpper.packed(arr).length.toLong ==
      packedSize(small))
  }

  test("mat_vec_affine: equals the per-row double-fold model; encode/parse round-trips") {
    import spark.implicits._
    val gen = for {
      d <- Gen.chooseNum(1, 10)
      r <- Gen.chooseNum(1, 8)
      w <- Gen.listOfN(r, Gen.listOfN(d, Gen.chooseNum(-4f, 4f)))
      b <- Gen.listOfN(r, Gen.chooseNum(-4.0, 4.0))
      x <- Gen.listOfN(d, Gen.chooseNum(-4f, 4f))
    } yield (w.map(_.toArray).toArray, b.toArray, x)
    check(Prop.forAll(gen) { case (w, b, x) =>
      val enc = graft.plans.MatVecAffine.encode(w, b)
      val parsed = graft.plans.MatVecAffine.parse(enc)
      val roundTrips = parsed.w.map(_.toSeq).toSeq == w.map(_.toSeq).toSeq &&
        parsed.b.toSeq == b.toSeq
      val out = Seq(Tuple1(x)).toDF("v")
        .select(call_function("mat_vec_affine", col("v"), lit(enc)))
        .collect().head.getSeq[Float](0)
      val want = w.zip(b).map { case (row, bi) =>
        (row.zip(x).foldLeft(0.0) { case (acc, (wi, xi)) =>
          acc + wi.toDouble * xi.toDouble } - bi).toFloat
      }
      roundTrips && out == want.toSeq
    }, n = 30)
  }

  test("canonArray/canonMap: injective over adversarial nested values " +
      "(10⁴ randomized cases), NULL ≠ empty ≠ [NULL] separations hold") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("arr", ArrayType(StringType, containsNull = true)),
      StructField("m", MapType(StringType, StringType,
        valueContainsNull = true))))
    def encode(rows: Seq[Row]) = spark
      .createDataFrame(rows.asJava, schema)
      .select(col("id"), QueryDef.canonArray(col("arr")).as("ea"),
        QueryDef.canonMap(col("m")).as("em"))
      .collect()

    // the whole driver comparator rests on these encoders being
    // injective: a silent collision turns a real mismatch into a green
    // gate. Fuzz with every trigger character, the NULL token, escapes,
    // empties, astral + combining chars — and check injectivity ACROSS
    // batches (a global encoding→value map), not just within one.
    val piece = Gen.oneOf("", "NULL", ",", "[", "]", "{", "}", "\"",
      "\\", ":", "a", "b9", " ", "\\\"", "NUL", "NULLX", "\\N", "a,b",
      "\"a\"", "😀", "é")
    val str = Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, piece))
      .map(_.mkString)
    val elem = Gen.frequency(1 -> Gen.const(null: String), 5 -> str)
    val arrGen: Gen[Seq[String]] = Gen.frequency(
      1 -> Gen.const(null: Seq[String]),
      1 -> Gen.const(Seq.empty[String]),
      8 -> Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, elem)))
    val mapGen: Gen[Map[String, String]] = Gen.frequency(
      1 -> Gen.const(null: Map[String, String]),
      8 -> Gen.choose(0, 3)
        .flatMap(n => Gen.listOfN(n, Gen.zip(str, elem))).map(_.toMap))

    val arrByEnc = scala.collection.mutable.Map
      .empty[Option[String], Option[List[String]]]
    val arrByVal = scala.collection.mutable.Map
      .empty[Option[List[String]], Option[String]]
    val mapByEnc = scala.collection.mutable.Map
      .empty[Option[String], Option[Map[String, String]]]
    val mapByVal = scala.collection.mutable.Map
      .empty[Option[Map[String, String]], Option[String]]
    check(Prop.forAll(Gen.listOfN(250, Gen.zip(arrGen, mapGen))) { batch =>
      val rows = batch.zipWithIndex.map { case ((a, m), i) => Row(i, a, m) }
      encode(rows).forall { r =>
        val (a, m) = batch(r.getInt(0))
        val (ka, km) = (Option(a).map(_.toList), Option(m))
        val (ea, em) = (Option(r.getString(1)), Option(r.getString(2)))
        // distinct values → distinct encodings (enc→val stays single-
        // valued) AND same value → same encoding (val→enc too)
        arrByEnc.getOrElseUpdate(ea, ka) == ka &&
          arrByVal.getOrElseUpdate(ka, ea) == ea &&
          mapByEnc.getOrElseUpdate(em, km) == km &&
          mapByVal.getOrElseUpdate(km, em) == em
      }
    }, n = 40) // 40 batches × 250 values = 10⁴ cases

    // the documented separations, pinned to their exact literals
    val sep = encode(Seq(
      Row(0, null, null),
      Row(1, Seq.empty[String], Map.empty[String, String]),
      Row(2, Seq(null: String), Map("k:a" -> "b")),
      Row(3, Seq("NULL"), Map("k" -> "a:b")),
      Row(4, Seq(""), Map("k" -> (null: String)))))
      .map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    assert(sep(0)._1 == null && sep(0)._2 == null)
    assert(sep(1) == (("[]", "{}")))
    assert(sep(2)._1 == "[NULL]" && sep(3)._1 == "[\"NULL\"]")
    assert(sep(4)._1 == "[\"\"]")
    // the r-noted collision class: {k:a → b} must differ from {k → a:b}
    assert(sep(2)._2 != sep(3)._2)
    assert(sep(4)._2 == "{k:NULL}")
  }

  test("winnow_fps: kernel equals the HOF spelling it replaced, on random word " +
      "arrays INCLUDING null elements (skipped like array_join, no NPE)") {
    import spark.implicits._
    // ~1 in 9 elements is null: a direct SQL caller may hand the
    // registered function a containsNull array, and the kernel must
    // match array_join's skip-the-null semantics instead of NPE-ing
    val word = Gen.frequency(
      8 -> Gen.oneOf("a", "bb", "ccc", "dog", "x1", "zz9", "q", "été"),
      1 -> Gen.const(null: String))
    val gen = for {
      n <- Gen.chooseNum(0, 30)
      ws <- Gen.listOfN(n, word)
      k <- Gen.chooseNum(1, 4)
      w <- Gen.chooseNum(1, 5)
    } yield (ws, k, w)
    check(Prop.forAll(gen) { case (ws, k, w) =>
      val df = Seq(Tuple1(ws)).toDF("ws")
      val kernel = df.select(call_function("winnow_fps", col("ws"),
        lit(k), lit(w))).collect().head.getSeq[Long](0)
      // the reference model: positioned gram hashes, window minima,
      // first-occurrence distinct — the exact HOF spelling the kernel
      // replaced (kept here as the executable contract)
      val hof = df
        .filter(size(col("ws")) >= k + w - 1) // the pre-kernel guard
        .select(transform(sequence(lit(1), size(col("ws")) - (k - 1)),
          i => call_function("md5_prefix_long",
            array_join(slice(col("ws"), i, lit(k)), " "), lit(4))).as("gh"))
        .select(array_distinct(transform(
          sequence(lit(1), size(col("gh")) - (w - 1)),
          j => array_min(slice(col("gh"), j, lit(w))))))
        .collect().headOption.map(_.getSeq[Long](0)).getOrElse(Seq.empty)
      kernel == hof
    }, n = 60)
  }

  test("nfc_normalize: idempotent, matches the JDK reference, never lengthens") {
    import spark.implicits._
    // strings mixing ascii, precomposed, decomposed (combining marks),
    // and astral-plane codepoints
    val pieces = Gen.oneOf("a", "Z9 ", "\u00e9", "e\u0301", "\u00c5",
      "A\u030a", "\u4e2d", "\u0301", "\ud83d\ude00")
    val gen = Gen.listOf(pieces).map(_.mkString)
    check(Prop.forAll(gen) { (str: String) =>
      val Seq(once, twice) = Seq(Tuple1(str)).toDF("t")
        .select(call_function("nfc_normalize", col("t")).as("n1"))
        .select(col("n1"), call_function("nfc_normalize", col("n1")).as("n2"))
        .collect().head.toSeq.map(_.asInstanceOf[String])
      once == twice &&
        once == java.text.Normalizer.normalize(
          str, java.text.Normalizer.Form.NFC) &&
        once.length <= str.length
    }, n = 40)
  }
}
