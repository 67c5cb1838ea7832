package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** `sq_adist(qe, codes, mns, mxs)` — squared euclidean distance between
  * a full-float query and an SQ8-encoded corpus vector, decoding each
  * dimension IN the distance loop: d_i = (double)qe[i] − (mn_i +
  * code_i/255 · (mx_i − mn_i)), acc += d_i². Bit-identical to the
  * two-step spelling (decode into an array<double>, then
  * `float_dist_sq`) — same per-element double casts, same
  * left-to-right accumulation — but with NO intermediate array per row
  * and no interpreted higher-order function in the scan: the whole SQ8
  * ADC hot loop runs inside whole-stage codegen with zero allocation
  * (the [[FloatDistSq]] rationale applied to the decode too). Length
  * mismatch on any input → NULL, like [[FloatDistSq]]. */
case class SqAdist(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _),
          ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "sq_adist requires (array<float>, array<int>, array<float>, " +
          s"array<float>), got ${a.simpleString}, ${b.simpleString}, " +
          s"${c.simpleString}, ${d.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_adist"
  override def nullable: Boolean = true

  override def nullSafeEval(q: Any, cds: Any, mn: Any, mx: Any): Any =
    SqAdist.adist(q.asInstanceOf[ArrayData], cds.asInstanceOf[ArrayData],
      mn.asInstanceOf[ArrayData], mx.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, mn, mx) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val dec = ctx.freshName("dec")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $q.numElements();
         |if ($c.numElements() != $n || $mn.numElements() != $n ||
         |    $mx.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $lo = (double)$mn.getFloat($i);
         |    final double $hi = (double)$mx.getFloat($i);
         |    final double $dec = $lo + (double)$c.getInt($i) / 255.0 * ($hi - $lo);
         |    final double $d = (double)$q.getFloat($i) - $dec;
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SqAdist =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object SqAdist {
  def adist(q: ArrayData, codes: ArrayData, mns: ArrayData,
      mxs: ArrayData): java.lang.Double = {
    val n = q.numElements()
    if (codes.numElements() != n || mns.numElements() != n ||
      mxs.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val mn = mns.getFloat(i).toDouble
      val mx = mxs.getFloat(i).toDouble
      val dec = mn + codes.getInt(i).toDouble / 255.0 * (mx - mn)
      val d = q.getFloat(i).toDouble - dec
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
