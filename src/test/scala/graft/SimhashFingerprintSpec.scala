package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The codegen'd one-pass simhash_fp expression (GraftExtensions). */
class SimhashFingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("simhash_fp: matches the 48 aggregate bit-vote folds it replaces") {
    import spark.implicits._
    val df = Seq(
      Array(0x0000FFFFFFL, 0x0000FFFFFFL, 0xAAAAAAAAAAAAL),
      Array(0L),
      Array((1L << 48) - 1, 1L, 2L, 4L))
      .toDF("ts")
    val native = df.select(call_function("simhash_fp", col("ts"), lit(48)))
      .collect().map(_.getLong(0)).toSeq
    val hofFp = (0 until 48).map { b =>
      val vote = aggregate(col("ts"), lit(0),
        (acc, t) => acc +
          when(t.bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val hof = df.select(hofFp).collect().map(_.getLong(0)).toSeq
    assert(native == hof)
  }

  test("simhash_fp: ties vote to 0 bit; empty array is all-zero; null propagates") {
    import spark.implicits._
    // two elements with opposite bit 0 → vote 0 → bit cleared
    val df = Seq(Some(Array(1L, 0L)), Some(Array.empty[Long]), None).toDF("ts")
    val rows = df.select(call_function("simhash_fp", col("ts"), lit(4))).collect()
    assert(rows(0).getLong(0) == 0L) // votes: bit0 = +1-1 = 0 → cleared
    assert(rows(1).getLong(0) == 0L)
    assert(rows(2).isNullAt(0))
  }

  test("simhash_fp: order-independent fingerprint") {
    import spark.implicits._
    val a = Seq(Array(7L, 12L, 99L, 12L)).toDF("ts")
    val b = Seq(Array(12L, 99L, 12L, 7L)).toDF("ts")
    val fa = a.select(call_function("simhash_fp", col("ts"), lit(48))).collect()(0).getLong(0)
    val fb = b.select(call_function("simhash_fp", col("ts"), lit(48))).collect()(0).getLong(0)
    assert(fa == fb)
  }
}
