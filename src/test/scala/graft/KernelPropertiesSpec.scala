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
