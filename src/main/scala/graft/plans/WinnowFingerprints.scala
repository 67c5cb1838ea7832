package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd windowed-winnowing fingerprint selection (Schleimer,
  * Wilkerson & Aiken, SIGMOD 2003 §4): per-position md5-prefix-4
  * hashes of the space-joined word k-grams, sliding-window (size `w`)
  * minima, distinct in first-occurrence order — ONE tight pass.
  *
  * Exists because the higher-order-function spelling of the same
  * computation (`transform(sequence…, j → array_min(slice(gh, j, w)))`
  * over `gh = transform(sequence…, i → md5(array_join(slice(ws, i,
  * k))))`) is CodegenFallback AND gets inlined by Catalyst into the
  * explode-derived `size(fps) > 0` pushed filter — where the window
  * lambda re-evaluates the ENTIRE inner gram transform per window
  * position: O(n²) interpreted work per row (measured 186 s for the
  * p120 sweep key at sf0.1; this kernel does the identical arithmetic
  * in one linear pass). The md5 arithmetic is [[TextHashes.hashOne]]
  * — bit-identical to `CAST('0x' || substr(md5(gram), 1, 8) AS
  * BIGINT)`, so the DuckDB oracle is unchanged.
  *
  * Null elements are skipped within a gram — the `array_join`
  * semantics of the HOF spelling this kernel replaced (and the
  * [[OphSignature]] convention), so a direct SQL caller with a
  * nullable array gets the same fingerprints, not an NPE. A null
  * input array yields null; fewer than one full window (n <
  * w + k − 1 words) yields an EMPTY array — callers filter on
  * `size(fps) > 0` (cheap: the kernel is codegen'd, so the filter's
  * duplicate evaluation costs one linear pass, not the HOF pyramid).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 64, s"winnow_fps: k must be in [1, 64], got $k")
  require(w >= 1 && w <= 256, s"winnow_fps: w must be in [1, 256], got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowFingerprints.fps(input.asInstanceOf[ArrayData], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ws => {
      val out = ctx.freshName("fps")
      val cls = WinnowFingerprints.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |final long[] $out = $cls.fps($ws, $k, $w);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** One-pass kernel shared by interpreted eval and codegen. */
  def fps(ws: ArrayData, k: Int, w: Int): Array[Long] = {
    val n = ws.numElements()
    val npos = n - k + 1
    if (npos < w) return Array.emptyLongArray
    val gh = new Array[Long](npos)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < npos) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < k) {
        // skip nulls like array_join did in the HOF spelling — no
        // separator is emitted for a skipped element
        if (!ws.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(ws.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      gh(i) = TextHashes.hashOne(UTF8String.fromString(sb.toString), 4)
      i += 1
    }
    // sliding-window minima (O(n·w), w is a small parameter), distinct
    // in first-occurrence order — the array_distinct contract
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var jw = 0
    while (jw + w <= npos) {
      var m = Long.MaxValue
      var t = 0
      while (t < w) {
        val v = gh(jw + t)
        if (v < m) m = v
        t += 1
      }
      seen.add(m)
      jw += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }
}
