package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** `gopher_repetition(ws)` — the nine character-fraction repetition
  * signals of Gopher's quality pack (Rae et al., "Scaling Language
  * Models: ... Gopher", 2021, Table A1) in ONE codegen'd pass:
  * `[top2, top3, top4, dup5, dup6, dup7, dup8, dup9, dup10]` where
  * `topK` is the fraction of the document's word characters covered
  * by occurrences of the single MOST FREQUENT word-k-gram (ties break
  * to the smallest gram hash — deterministic and oracle-replayable),
  * and `dupK` is the fraction covered by ALL word-k-grams occurring
  * more than once in the document. "Covered" marks each word index
  * once however many qualifying windows overlap it (the paper's
  * fraction-of-characters reading), and characters count CODE POINTS
  * of the words themselves (whitespace is layout, not content).
  *
  * One word-hash pass ([[TextHashes.wordHashes48]]) feeds nine O(n)
  * rolling-hash scans ([[TextHashes.rollHashes]]) — no per-window
  * digests, no intermediate gram strings. A document shorter than k
  * words scores 0 for that k; an empty/whitespace-only document
  * scores all zeros. */
case class GopherRepetition(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_repetition requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gopher_repetition"

  override def nullSafeEval(input: Any): Any =
    GopherRepetition.signals(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = GopherRepetition.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.signals($arr);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): GopherRepetition =
    copy(child = newChild)
}

object GopherRepetition {
  def signals(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val wordLens = new Array[Long](n)
    var totalChars = 0L
    var i = 0
    while (i < n) {
      val len = if (arr.isNullAt(i)) 0L else arr.getUTF8String(i).numChars().toLong
      wordLens(i) = len
      totalChars += len
      i += 1
    }
    val out = new Array[Double](9)
    if (totalChars > 0) {
      val wh = TextHashes.wordHashes48(arr)
      val covered = new Array[Boolean](n)
      def coveredChars(k: Int, qualifies: Long => Boolean,
          hashes: Array[Long]): Double = {
        java.util.Arrays.fill(covered, false)
        var p = 0
        while (p < hashes.length) {
          if (qualifies(hashes(p))) {
            var j = p
            while (j < p + k) { covered(j) = true; j += 1 }
          }
          p += 1
        }
        var chars = 0L
        var w = 0
        while (w < n) { if (covered(w)) chars += wordLens(w); w += 1 }
        chars.toDouble / totalChars
      }
      var k = 2
      while (k <= 10) {
        val hashes = TextHashes.rollHashes(wh, k)
        if (hashes.nonEmpty) {
          val counts = new java.util.HashMap[java.lang.Long, Int]()
          var p = 0
          while (p < hashes.length) {
            counts.merge(hashes(p), 1, (a, b) => a + b)
            p += 1
          }
          if (k <= 4) {
            // the single most frequent k-gram; ties to the SMALLEST hash
            var bestH = 0L
            var bestC = 0
            val it = counts.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              val h = e.getKey.longValue()
              val c = e.getValue.intValue()
              if (c > bestC || (c == bestC && h < bestH)) {
                bestH = h; bestC = c
              }
            }
            out(k - 2) = coveredChars(k, _ == bestH, hashes)
          } else {
            out(k - 2) = coveredChars(k,
              h => counts.get(h).intValue() >= 2, hashes)
          }
        }
        k += 1
      }
    }
    new GenericArrayData(out)
  }
}
