package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** `jl_project(vec, dim, outDim)` — Johnson–Lindenstrauss signed random
  * projection (Achlioptas 2003) of an `array<float>` vector:
  * y_j = (Σ_d w(j,d)·x_d) / √outDim with the deterministic md5-derived
  * ±1 weight family shared with the SRP-LSH hyperplanes
  * (`Pipeline.srpWeight`, oracle-replayable — no RNG anywhere).
  *
  * Bit-identical to the literal-array spelling (`float_dot` against an
  * outDim×dim stack of ±1 literal arrays): same left-to-right double
  * fold per output dim (±1.0 multiplication is exact), same
  * double→float RNE round of acc·(1/√outDim). The kernel exists
  * because at the documented 768→64 production scale the literal
  * spelling inlines ~49k expression nodes into one select — slow
  * analysis and a whole-stage-codegen size-limit fallback risk
  * (ADVICE r14) — while this expression is ONE node whose weight
  * table is built once per (dim, outDim) and bound as a codegen
  * reference object. A vector whose length is not `dim` yields NULL
  * (the literal spelling produced an array of NULL elements; this is
  * the same "no usable projection" outcome with an earlier, clearer
  * surface). */
case class JlProject(child: Expression, dim: Int, outDim: Int)
    extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(outDim >= 1, s"outDim must be >= 1, got $outDim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jl_project requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "jl_project"
  // wrong-length input → NULL, so nullable even over non-null input
  override def nullable: Boolean = true

  @transient private lazy val table: Array[Double] =
    JlProject.weights(dim, outDim)

  override def nullSafeEval(input: Any): Any =
    JlProject.project(input.asInstanceOf[ArrayData], table, dim, outDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = JlProject.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val w = ctx.addReferenceObj("jlWeights", table, "double[]")
      s"""
         |${ev.value} = $cls.project($v, $w, $dim, $outDim);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

object JlProject {

  /** md5-derived ±1 weight — IDENTICAL formula to `Pipeline.srpWeight`
    * (parity of the first md5 byte of "srp-j-d"); duplicated here
    * because plans/ must not depend on operators/ — pinned equal by
    * JlProjectSpec so the two copies can never drift. */
  private def srpWeight(j: Int, d: Int): Double = {
    val b = java.security.MessageDigest.getInstance("MD5")
      .digest(s"srp-$j-$d".getBytes("UTF-8"))(0)
    if ((b & 0xff) % 2 == 0) 1.0 else -1.0
  }

  private val cache = TrieMap.empty[(Int, Int), Array[Double]]

  /** Flat [j·dim + d] ±1 table, built once per (dim, outDim). */
  def weights(dim: Int, outDim: Int): Array[Double] =
    cache.getOrElseUpdate((dim, outDim), {
      val t = new Array[Double](outDim * dim)
      var j = 0
      while (j < outDim) {
        var d = 0
        while (d < dim) { t(j * dim + d) = srpWeight(j, d); d += 1 }
        j += 1
      }
      t
    })

  /** Sequential double fold per output dim — the same accumulation
    * order as `float_dot` over the literal weight array. */
  def project(v: ArrayData, w: Array[Double], dim: Int,
      outDim: Int): ArrayData = {
    if (v.numElements() != dim) return null
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Float](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var d = 0
      val base = j * dim
      while (d < dim) {
        acc += v.getFloat(d).toDouble * w(base + d)
        d += 1
      }
      out(j) = (acc * inv).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }
}
