package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The codegen'd jl_project kernel (ADVICE r14: replaces the literal
  * ±1 weight-array spelling that inlined ~49k expression nodes at
  * 768→64). Pins kernel ≡ the float_dot literal spelling it replaced
  * ≡ an independent md5 recomputation, so the kernel's weight-table
  * copy, Pipeline.srpWeight, and the p69/p70 oracle SQL can never
  * drift apart. */
class JlProjectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent copy of the deterministic ±1 family: parity of the
    * first md5 byte of "srp-j-d". */
  private def w(j: Int, d: Int): Double = {
    val b = java.security.MessageDigest.getInstance("MD5")
      .digest(s"srp-$j-$d".getBytes("UTF-8"))(0)
    if ((b & 0xff) % 2 == 0) 1.0 else -1.0
  }

  test("jl_project: bit-identical to the literal float_dot spelling and the local fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val dim = 12
    val outDim = 5
    val vecs = (0 until 8).map(_ => Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val df = vecs.map(Tuple1(_)).toDF("v")
    val got = df.select(
      call_function("jl_project", col("v"), lit(dim), lit(outDim)).as("p"))
      .collect().map(_.getSeq[Float](0).toSeq)
    // the literal-array spelling the kernel replaced (pre-r15 randomProject)
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val literal = df.select(array((0 until outDim).map { j =>
      val wj = array((0 until dim).map(d => lit(w(j, d).toFloat)): _*)
      (call_function("float_dot", col("v"), wj) * inv)
        .cast(org.apache.spark.sql.types.FloatType)
    }: _*).as("p"))
      .collect().map(_.getSeq[Float](0).toSeq)
    assert(got.map(_.toSeq).toSeq == literal.map(_.toSeq).toSeq)
    // and the plain sequential fold
    val expected = vecs.map { v =>
      (0 until outDim).map { j =>
        var acc = 0.0
        (0 until dim).foreach(d => acc += v(d).toDouble * w(j, d))
        (acc * inv).toFloat
      }
    }
    assert(got.toSeq.map(_.toSeq) == expected.map(_.toSeq))
  }

  test("jl_project: eval agrees with codegen; wrong length and NULL yield NULL") {
    import spark.implicits._
    val df = Seq(Some(Array(1f, 2f, 3f)), Some(Array(1f, 2f)), None)
      .map(Tuple1(_)).toDF("v")
    val rows = df.select(
      call_function("jl_project", col("v"), lit(3), lit(2)).as("p")).collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0), "wrong-dim vector must yield NULL")
    assert(rows(2).isNullAt(0), "NULL vector must yield NULL")
    // interpreted eval path (no codegen) agrees
    val e = graft.plans.JlProject(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f, 3f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)), 3, 2)
    val evald = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toFloatArray().toSeq
    assert(evald == rows(0).getSeq[Float](0).toSeq)
    val bad = graft.plans.JlProject(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)), 3, 2)
    assert(bad.eval(null) == null)
  }

  test("jl_project: randomProject rides the kernel and preserves its contract") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val out = operators.Pipeline.randomProject(df, "embedding", dim = 16,
      outDim = 4)
    // plan carries ONE jl_project node, not 4 float_dot folds
    val plan = out.queryExecution.analyzed.toString()
    assert(plan.contains("jl_project"))
    assert(!plan.contains("float_dot"))
    val p = out.select(col("projected")).collect()(0).getSeq[Float](0)
    assert(p.length == 4)
  }
}
