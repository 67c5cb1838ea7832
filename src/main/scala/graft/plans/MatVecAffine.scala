package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** `mat_vec_affine(vec, encoded)` — y_i = W_i·x − b_i over a float
  * vector, with the whole (W, b) model baked into ONE foldable string
  * literal (rows of space-separated floats separated by ';', then '|',
  * then the b row): the [[BpeSegment]] baked-table pattern applied to
  * dense linear models. This is the plan-size fix for the literal-array
  * formulation `pcaProject`/`quadFormExpr` started with — an
  * nComponents×dim literal `array(lit…)` tree is the same
  * ~50k-node-plan failure mode the r15 jl_project kernel retired
  * (ADVICE r14: the JL projection once planned ~49k literal nodes);
  * here the model is ONE string literal parsed once per expression
  * instance and shared across rows via a codegen reference object.
  *
  * Arithmetic contract (shared with `float_dot`, so oracles and the
  * literal formulation agree bit-for-bit): products are
  * (double)W_ij · (double)x_j accumulated left-to-right in a double,
  * b_i subtracted in double, result cast to FLOAT. W values are parsed
  * as floats (the same quantization the literal arrays carried); b
  * values as doubles (they are fold-of-float constants).
  *
  * NULL in → NULL out; a vector shorter than a W row reads as an
  * error (the model's dim is a contract, not a hint). */
case class MatVecAffine(child: Expression, encoded: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec_affine requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "mat_vec_affine"

  @transient private lazy val model: MatVecAffine.Model =
    MatVecAffine.parse(encoded)

  override def nullSafeEval(input: Any): Any =
    MatVecAffine.apply(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("mvaModel", model,
        classOf[MatVecAffine.Model].getName)
      val cls = MatVecAffine.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.apply($x, $ref);"
    })

  override protected def withNewChildInternal(newChild: Expression): MatVecAffine =
    copy(child = newChild)
}

object MatVecAffine {

  final class Model(val w: Array[Array[Float]], val b: Array[Double])
    extends Serializable

  /** "r0c0 r0c1 …;r1c0 …|b0 b1 …" → Model. */
  def parse(encoded: String): Model = {
    val parts = encoded.split('|')
    require(parts.length == 2,
      s"mat_vec_affine: expected 'rows|bias', got ${parts.length} sections")
    val w = parts(0).split(';').map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+").map(_.toFloat))
    val b = parts(1).trim.split("\\s+").map(_.toDouble)
    require(w.nonEmpty && w.length == b.length,
      s"mat_vec_affine: ${w.length} rows vs ${b.length} bias entries")
    val dim = w.head.length
    require(w.forall(_.length == dim),
      "mat_vec_affine: ragged weight rows")
    new Model(w, b)
  }

  /** Encode (W, b) for the literal — the exact inverse of [[parse]]
    * (Float.toString/Double.toString round-trip exactly). */
  def encode(w: Array[Array[Float]], b: Array[Double]): String =
    w.map(_.mkString(" ")).mkString(";") + "|" + b.mkString(" ")

  def apply(x: ArrayData, m: Model): ArrayData = {
    val dim = m.w.head.length
    require(x.numElements() == dim,
      s"mat_vec_affine: vector has ${x.numElements()} elements, model dim $dim")
    val out = new Array[Float](m.w.length)
    var i = 0
    while (i < m.w.length) {
      val row = m.w(i)
      var s = 0.0
      var j = 0
      while (j < dim) { s += row(j).toDouble * x.getFloat(j).toDouble; j += 1 }
      out(i) = (s - m.b(i)).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
}
