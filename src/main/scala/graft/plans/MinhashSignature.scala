package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd one-pass MinHash signature over a shingle-hash array.
  *
  * Semantics: for each hash function i in 0 until n,
  * `sig[i] = min over x in xs of ((2i+1)*x + (99991*i+7)) mod 4294967311`
  * — exactly the universal-hash family the LSH dedup operators
  * (p02/p19/p23; reference semantics `cli/../dedup` has no counterpart,
  * this is the beyond-reference scale path) compute today as n separate
  * `array_min(transform(xs, ...))` columns. Higher-order functions are
  * CodegenFallback: each of the n columns re-traverses the array
  * interpreted and allocates an intermediate array per row, so the
  * signature stage costs n traversals + n allocations per document.
  * This native Expression computes ALL n minima in ONE traversal with a
  * single primitive long[] accumulator inside whole-stage codegen.
  *
  * The arithmetic is bit-identical to the HOF formulation (pure long
  * multiply/add/mod — no floating point), so the DuckDB oracle CTEs are
  * unchanged. Null elements are not expected (shingle arrays are built
  * non-null); a null INPUT array yields null.
  */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 64,
    s"minhash_sig: numHashes must be in [1, 64], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val sig = MinhashSignature.signature(xs, numHashes)
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val sig = ctx.freshName("sig")
      val cls = MinhashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |final long[] $sig = $cls.signature($xs, $numHashes);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  /** Mersenne-ish prime > 2^32 used by the universal-hash family. */
  final val P = 4294967311L

  /** One-pass n-minima kernel, shared by interpreted eval and codegen.
    * a_i = 2i+1, b_i = 99991i+7 — the family in Pipeline.hashA/hashB.
    * Inputs must fit in 32 bits so a_i*x+b_i never overflows a long
    * (n ≤ 64) — ENFORCED, not assumed: a wider value would silently
    * produce negative "minima". Null elements are skipped (the HOF
    * spelling maps them to null and array_min ignores nulls). */
  def signature(xs: ArrayData, n: Int): Array[Long] = {
    val sig = Array.fill(n)(Long.MaxValue)
    val len = xs.numElements()
    var j = 0
    while (j < len) {
      if (!xs.isNullAt(j)) {
        val x = xs.getLong(j)
        if ((x >>> 32) != 0L) throw new IllegalArgumentException(
          s"minhash_sig: element $x exceeds 32 bits — use a <= 4-byte hash " +
            "(e.g. md5_prefix_long(s, 4)) so the universal-hash arithmetic " +
            "cannot overflow")
        var i = 0
        while (i < n) {
          val h = ((2L * i + 1) * x + (99991L * i + 7)) % P
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    // empty input: min over empty set — degenerate, return b_i mod P of
    // nothing; callers filter size(ws) >= 5 so xs is non-empty, but keep
    // the output total rather than Long.MaxValue sentinels
    sig
  }
}
