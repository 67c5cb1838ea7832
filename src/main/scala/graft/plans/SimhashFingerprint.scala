package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd one-pass SimHash fingerprint over a token-hash array.
  *
  * Semantics (bit-identical to the 48 `aggregate(...)` vote folds it
  * replaces, and to the oracle's exploded SUM(CASE...) spelling): for
  * each bit b in 0 until numBits, vote(b) = Σ over t in ts of
  * (+1 if bit b of t is set else −1); output bit b is set iff
  * vote(b) > 0. Pure integer arithmetic — no ordering or float
  * sensitivity, so the fingerprint is independent of traversal order.
  *
  * The HOF formulation costs numBits interpreted traversals of the
  * token array per document (higher-order functions are
  * CodegenFallback); this expression makes ONE traversal with a
  * primitive int[] vote accumulator inside whole-stage codegen.
  * Null ELEMENTS are skipped (they carry no vote — the pipeline never
  * produces them, but the function is registered session-wide); a
  * null input array yields null.
  */
case class SimhashFingerprint(child: Expression, numBits: Int)
    extends UnaryExpression {

  require(numBits >= 1 && numBits <= 64,
    s"simhash_fp: numBits must be in [1, 64], got $numBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fp"

  override def nullSafeEval(input: Any): Any =
    SimhashFingerprint.fingerprint(input.asInstanceOf[ArrayData], numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ts => {
      val cls = "graft.plans.SimhashFingerprint$.MODULE$"
      s"${ev.value} = $cls.fingerprint($ts, $numBits);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashFingerprint =
    copy(child = newChild)
}

object SimhashFingerprint {
  /** One-pass vote kernel shared by interpreted eval and codegen. */
  def fingerprint(ts: ArrayData, numBits: Int): Long = {
    val votes = new Array[Int](numBits)
    val len = ts.numElements()
    var j = 0
    while (j < len) {
      if (!ts.isNullAt(j)) {
        val t = ts.getLong(j)
        var b = 0
        while (b < numBits) {
          if (((t >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < numBits) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}
