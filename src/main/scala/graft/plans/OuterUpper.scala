package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd packed upper-triangle outer product of a float vector:
  * for x of length d, returns the d(d+1)/2 doubles
  * [x₀x₀, x₀x₁, …, x₀x_{d−1}, x₁x₁, …, x_{d−1}x_{d−1}] in row-major
  * (i ≤ j) order — the per-row moment contribution
  * `embeddingMeanCov` aggregates. One tight double loop per row
  * replaces the two-generator dim² fan-out the operator previously
  * planned (4096 generated rows per 64-dim vector down to 2080, with
  * the products computed inside whole-stage codegen instead of one
  * expression tree per pair). Products are (double)x[i] * (double)x[j]
  * — the identical IEEE arithmetic the p105 oracle replays, so the
  * rewrite changes the plan, not one output bit.
  *
  * Shares the static kernel between interpreted eval and codegen (the
  * [[MinhashSignature]] pattern). Elements must be non-null (embedding
  * vectors, the [[FloatDotProduct]] contract). */
case class OuterUpper(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"outer_upper requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "outer_upper"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(OuterUpper.packed(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val out = ctx.freshName("out")
      val cls = OuterUpper.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |final double[] $out = $cls.packed($x);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OuterUpper =
    copy(child = newChild)
}

object OuterUpper {
  /** Packed upper-triangle cell count, computed in Long: d*(d+1)
    * wraps Int at d >= 46341, so an Int-typed size would go negative
    * (NegativeArraySizeException) for d in [46341, 65535] — inside
    * the accepted bound. At the 65535 cap the Long size (2147450880)
    * still fits an Int array exactly. */
  def packedSize(d: Int): Long = d.toLong * (d + 1) / 2

  def packed(x: ArrayData): Array[Double] = {
    val d = x.numElements()
    // The operator path caps dim at 1024, but the function is
    // SQL-registered, so direct callers need the loud bound.
    val sz = packedSize(d)
    require(d <= 65535,
      s"outer_upper: input has $d elements; the packed upper triangle " +
        s"has $sz cells, past the 65535-element bound (a >2-billion-cell " +
        "moment row is not a usable covariance accumulator) — reduce " +
        "dimensionality first (e.g. jl_project)")
    val out = new Array[Double](sz.toInt)
    var k = 0
    var i = 0
    while (i < d) {
      val xi = x.getFloat(i).toDouble
      var j = i
      while (j < d) {
        out(k) = xi * x.getFloat(j).toDouble
        k += 1; j += 1
      }
      i += 1
    }
    out
  }
}
