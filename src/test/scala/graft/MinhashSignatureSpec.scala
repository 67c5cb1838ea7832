package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The codegen'd one-pass minhash_sig expression (GraftExtensions). */
class MinhashSignatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val P = graft.plans.MinhashSignature.P

  test("minhash_sig: matches the 32 transform+array_min columns it replaces") {
    import spark.implicits._
    val df = Seq(
      Array(17L, 4096L, 99999L, 3L),
      Array(4294967295L), // max 32-bit shingle id
      Array(0L, 1L, 2L))
      .toDF("xs")
    val native = df.select(call_function("minhash_sig", col("xs"), lit(32)))
      .collect().map(_.getSeq[Long](0).toVector)
    val hof = df.select(array((0 until 32).map(i =>
      array_min(transform(col("xs"),
        x => (lit(2L * i + 1) * x + lit(99991L * i + 7)) % P))): _*))
      .collect().map(_.getSeq[Long](0).toVector)
    assert(native.toSeq == hof.toSeq)
  }

  test("minhash_sig: interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.ArrayType
    val expr = graft.plans.MinhashSignature(
      BoundReference(0, ArrayType(LongType), nullable = true), 8)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(Array(123L, 456789L, 42L)))
    val out = expr.eval(row).asInstanceOf[GenericArrayData].toLongArray()
    val expected = (0 until 8).map(i =>
      Seq(123L, 456789L, 42L)
        .map(x => ((2L * i + 1) * x + (99991L * i + 7)) % P).min)
    assert(out.toSeq == expected)
  }

  test("minhash_sig: null input yields null; wrong element type rejected") {
    import spark.implicits._
    val n = Seq(Option.empty[Array[Long]]).toDF("xs")
      .select(call_function("minhash_sig", col("xs"), lit(4)))
    assert(n.collect()(0).isNullAt(0))
    val e = intercept[Exception] {
      Seq(Array("a")).toDF("xs")
        .select(call_function("minhash_sig", col("xs"), lit(4))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("minhash_sig") ||
      e.getMessage.toLowerCase.contains("datatype"))
  }

  test("minhash_sig: non-literal numHashes rejected") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((Array(1L), 4)).toDF("xs", "n")
        .select(call_function("minhash_sig", col("xs"), col("n"))).collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
