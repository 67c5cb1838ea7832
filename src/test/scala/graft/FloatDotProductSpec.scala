package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The codegen'd float_dot expression registered by GraftExtensions. */
class FloatDotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("float_dot: sequential double accumulation, codegen and eval agree") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.4f)))
      .toDF("a", "b")
      .select(call_function("float_dot", col("a"), col("b")).as("d"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    // reference values computed by the same sequential fold
    def fold(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    assert(got == Seq(fold(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      fold(Seq(0.1f, 0.2f), Seq(0.3f, 0.4f))))
  }

  test("float_dist_sq: matches the HOF fold bit-exactly; nulls propagate") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(0.5, 2.0, 3.25)),
      (Array(0.1f, 0.2f), Array(0.30000001, -0.4)))
      .toDF("a", "b")
    val got = df.select(call_function("float_dist_sq", col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    // the HOF spelling the expression replaces must agree bit-exactly
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == hof)
    def fold(a: Seq[Float], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        val d = x.toDouble - y; acc + d * d }
    assert(got == Seq(fold(Seq(1f, 2f, 3f), Seq(0.5, 2.0, 3.25)),
      fold(Seq(0.1f, 0.2f), Seq(0.30000001, -0.4))))
    val n = Seq((Some(Array(1f)), Option.empty[Array[Double]]))
      .toDF("a", "b")
      .select(call_function("float_dist_sq", col("a"), col("b")).as("d"))
    assert(n.collect()(0).isNullAt(0))
    intercept[Exception] {
      Seq((Array(1f), Array(1f))).toDF("a", "b")
        .select(call_function("float_dist_sq", col("a"), col("b"))).collect()
    }
  }

  test("float_dot/float_dist_sq: length mismatch yields NULL like the HOF spelling") {
    import spark.implicits._
    // zip_with null-pads the shorter side, so the HOF sum is NULL on
    // mismatched dimensions — the native kernels must agree (a truncated
    // partial product would silently mis-rank a corrupt embedding)
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f)),        // mismatch → NULL
      (Array(1f, 2f), Array(3f, 4f)))            // match → value
      .toDF("a", "b")
    val dot = df.select(call_function("float_dot", col("a"), col("b")).as("d"))
      .collect()
    assert(dot(0).isNullAt(0))
    assert(dot(1).getDouble(0) == 11.0)
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x).as("d")).collect()
    assert(hof(0).isNullAt(0)) // the spelling the kernel claims identity with
    val dist = Seq((Array(1f, 2f, 3f), Array(0.5, 2.0)))
      .toDF("a", "b")
      .select(call_function("float_dist_sq", col("a"), col("b")).as("d"))
      .collect()
    assert(dist(0).isNullAt(0))
    // interpreted eval agrees with the codegen path
    val e = graft.plans.FloatDotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f, 3f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4f, 5f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) == null)
  }

  test("float_dot: null array propagates, type mismatch rejected") {
    import spark.implicits._
    val df = Seq((Some(Array(1f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(call_function("float_dot", col("a"), col("b")).as("d"))
    assert(df.collect()(0).isNullAt(0))
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(call_function("float_dot", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("float_dot") ||
      e.getMessage.contains("array<float>"))
  }
}
