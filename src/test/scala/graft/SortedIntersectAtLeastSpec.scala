package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The codegen'd sorted_intersect_atleast expression (the thresholded
  * p04 verify kernel): any return ≥ 0 must be the EXACT intersection
  * size, and -1 must fire exactly when the true count < min. */
class SortedIntersectAtLeastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("atleast: exact count when reachable, -1 exactly when count < min") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300) {
      val a = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted.toArray
      val b = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted.toArray
      // min sweeps below, at, and above the true count
      (a, b, rnd.nextInt(40) - 5)
    } :+ ((Array.empty[Long], Array(1L, 2L), 1)) :+
      ((Array(3L), Array.empty[Long], 0)) :+
      ((Array.empty[Long], Array.empty[Long], -3))
    val got = rows.toDF("a", "b", "m").select(
      call_function("sorted_intersect_atleast",
        col("a"), col("b"), col("m")).as("c"),
      call_function("sorted_intersect_count", col("a"), col("b")).as("ref"),
      col("m"))
      .collect()
    got.foreach { r =>
      val (c, ref, m) = (r.getInt(0), r.getInt(1), r.getInt(2))
      if (ref >= m) assert(c == ref, s"expected exact $ref at min=$m, got $c")
      else assert(c == -1, s"expected -1 (ref=$ref < min=$m), got $c")
    }
  }

  test("atleast: interpreted eval agrees with codegen, incl. null elements") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType, IntegerType}
    def lit(xs: Seq[java.lang.Long]) =
      Literal.create(xs, ArrayType(LongType, containsNull = true))
    def run(a: Seq[java.lang.Long], b: Seq[java.lang.Long], m: Int) =
      graft.plans.SortedIntersectAtLeast(lit(a), lit(b),
        Literal.create(m, IntegerType)).eval(null)
    assert(run(Seq(1L, 3L, 5L), Seq(1L, 2L, 5L, 9L), 2) == 2)
    assert(run(Seq(1L, 3L, 5L), Seq(1L, 2L, 5L, 9L), 3) == -1)
    // leading null runs match once (nulls-first sort order), counted
    // before the bail bound arms
    assert(run(Seq(null, 1L, 5L), Seq(null, 5L), 2) == 2)
    assert(run(Seq(null, 1L, 5L), Seq(null, 5L), 3) == -1)
    // min <= 0 never bails — degenerates to the plain count
    assert(run(Seq(2L, 4L), Seq(1L, 3L), 0) == 0)
    assert(run(Seq(2L, 4L), Seq(1L, 3L), -7) == 0)
  }

  test("atleast: null input propagates, wrong arity/type rejected") {
    import spark.implicits._
    val df = Seq((Some(Array(1L)), Option.empty[Array[Long]], 1))
      .toDF("a", "b", "m")
      .select(call_function("sorted_intersect_atleast",
        col("a"), col("b"), col("m")).as("c"))
    assert(df.collect()(0).isNullAt(0))
    val e = intercept[Exception] {
      Seq((Array(1L), Array(1L))).toDF("a", "b")
        .select(call_function("sorted_intersect_atleast", col("a"), col("b")))
        .collect()
    }
    assert(e.getMessage.contains("sorted_intersect_atleast"))
  }
}
