package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The codegen'd sorted_intersect_count expression registered by
  * GraftExtensions (the p04 verify kernel). */
class SortedIntersectCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sorted_intersect_count matches size(array_intersect) on random sorted sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted.toArray
      val b = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted.toArray
      (a, b)
    } :+ ((Array.empty[Long], Array(1L, 2L))) :+
      ((Array(3L), Array.empty[Long])) :+
      ((Array.empty[Long], Array.empty[Long]))
    val df = rows.toDF("a", "b")
    val got = df.select(
      call_function("sorted_intersect_count", col("a"), col("b")).as("c"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // interpreted eval path must agree with codegen: evaluate the
    // expression directly (no wholestage) via a filter-less local eval
    val expr = graft.plans.SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 3L, 5L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 2L, 5L, 9L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)))
    assert(expr.eval(null) == 2)
  }

  test("sorted_intersect_count: null ELEMENTS follow array_intersect set semantics") {
    import spark.implicits._
    // nulls-first sorted arrays (sort_array's ascending default): a
    // null on both sides counts once, a one-sided null not at all —
    // exactly size(array_intersect). Exercises both codegen and the
    // interpreted path via the DataFrame plan + direct eval.
    val rows = Seq(
      (Seq[Option[Long]](None, Some(1L), Some(3L)), Seq[Option[Long]](None, Some(3L))),
      (Seq[Option[Long]](None, None, Some(2L)), Seq[Option[Long]](None, Some(2L))),
      (Seq[Option[Long]](None, Some(4L)), Seq[Option[Long]](Some(4L), Some(9L))),
      (Seq[Option[Long]](None), Seq[Option[Long]](None)),
      (Seq[Option[Long]](None), Seq[Option[Long]](Some(7L))))
    val got = rows.toDF("a", "b").select(
      call_function("sorted_intersect_count", col("a"), col("b")).as("c"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    val expr = graft.plans.SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[java.lang.Long](null, 1L, 5L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[java.lang.Long](null, 5L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true)))
    assert(expr.eval(null) == 2)
  }

  test("sorted_intersect_count: null propagates, type mismatch rejected") {
    import spark.implicits._
    val df = Seq((Some(Array(1L)), Option.empty[Array[Long]]))
      .toDF("a", "b")
      .select(call_function("sorted_intersect_count", col("a"), col("b")).as("c"))
    assert(df.collect()(0).isNullAt(0))
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(call_function("sorted_intersect_count", col("a"), col("b")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("sorted_intersect_count") ||
      e.getMessage.contains("array<bigint>"))
  }
}
