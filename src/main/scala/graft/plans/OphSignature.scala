package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd ONE-permutation MinHash (Li, Owen & Zhang, "One
  * Permutation Hashing", NIPS 2012) with rotation densification
  * (Shrivastava & Li, "Improved Densification of One Permutation
  * Hashing", ICML 2014): a single universal-hash pass buckets every
  * (distinct) shingle hash into `numBins` bins and keeps the per-bin
  * minimum QUOTIENT; empty bins borrow circularly from the next
  * non-empty bin at rotation distance t with a `+P·t` shift (the
  * paper's C·t offset — without it, two docs empty in the same bins
  * would spuriously "agree" whenever their donors agree).
  *
  * Estimator: (# matching slots) / numBins ≈ Jaccard — the classic
  * k-hash MinHash signature at ONE array traversal instead of k
  * ([[MinhashSignature]] does k minima in one traversal but still k
  * multiply-adds per element; this does ONE). At 100 TB the signature
  * stage is a full-corpus map pass, so the per-element constant is
  * the whole cost of that stage.
  *
  * Hash: `h = (x + 7) mod P` — the i = 0 member of the
  * [[MinhashSignature]] universal family (x is already an md5-derived
  * 32-bit value, so h inherits its uniformity); bin = h mod k, value
  * = h div k (quotient — uniform within the bin). Inputs must fit in
  * 32 bits (enforced, the [[MinhashSignature]] contract). Null
  * elements are skipped; a null input array yields null; an
  * all-empty input returns Long.MaxValue sentinels (callers filter
  * size(ws) >= 5, so at least one bin is always occupied and
  * densification is total). */
case class OphSignature(child: Expression, numBins: Int)
    extends UnaryExpression {

  require(numBins >= 1 && numBins <= 64,
    s"oph_sig: numBins must be in [1, 64], got $numBins")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"oph_sig requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "oph_sig"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      OphSignature.signature(input.asInstanceOf[ArrayData], numBins))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val sig = ctx.freshName("sig")
      val cls = OphSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |final long[] $sig = $cls.signature($xs, $numBins);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OphSignature =
    copy(child = newChild)
}

object OphSignature {
  /** Shared with [[MinhashSignature]] — the family's modulus. */
  final val P = MinhashSignature.P

  /** One-pass kernel shared by interpreted eval and codegen. */
  def signature(xs: ArrayData, k: Int): Array[Long] = {
    val bins = Array.fill(k)(Long.MaxValue)
    val len = xs.numElements()
    var j = 0
    while (j < len) {
      if (!xs.isNullAt(j)) {
        val x = xs.getLong(j)
        if ((x >>> 32) != 0L) throw new IllegalArgumentException(
          s"oph_sig: element $x exceeds 32 bits — use a <= 4-byte hash " +
            "(e.g. md5_prefix_long(s, 4)) so the universal-hash " +
            "arithmetic cannot overflow")
        val h = (x + 7L) % P
        val bin = (h % k).toInt
        val v = h / k
        if (v < bins(bin)) bins(bin) = v
      }
      j += 1
    }
    // densify from the SNAPSHOT: borrowed values come only from
    // genuine minima, never from other borrowed slots
    val out = new Array[Long](k)
    var b = 0
    while (b < k) {
      if (bins(b) != Long.MaxValue) out(b) = bins(b)
      else {
        out(b) = Long.MaxValue // all-empty input keeps the sentinel
        var t = 1
        var found = false
        while (t < k && !found) {
          val s = (b + t) % k
          if (bins(s) != Long.MaxValue) {
            out(b) = bins(s) + P * t
            found = true
          }
          t += 1
        }
      }
      b += 1
    }
    out
  }
}
