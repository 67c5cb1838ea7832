package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `sentence_chunk_spans(ws, chunkWords, overlapWords)` — the
  * data-dependent chunk layout of sentence-boundary-aware chunking
  * ([[graft.operators.Pipeline.chunkText]] with
  * `respectSentences = true`): walk the words array left to right,
  * and for each chunk whose full `chunkWords` window does not reach
  * the end of the document, SNAP the chunk end to just after the LAST
  * sentence-final word inside the window (a word ending in the C4
  * terminal-punctuation set `. ! ? " ”` — the same rule the
  * c4CleanLines retention test applies to line ends); when no
  * sentence ends in-window, fall back to the fixed window. The next
  * chunk starts `overlapWords` before the snapped end (clamped to
  * strictly advance, so degenerate inputs — a sentence end on the
  * first window word — cannot loop forever); the final chunk keeps
  * the whole tail. Output: packed (start << 32) | end word spans, one
  * per chunk, ascending; an empty words array yields the single empty
  * chunk [0, 0) (parity with the fixed-window layout's one-chunk-
  * per-doc floor).
  *
  * A Catalyst kernel rather than higher-order Columns because the
  * layout is genuinely SEQUENTIAL per document (each chunk start
  * depends on the previous snap) — as a codegen'd one-pass loop it
  * stays map-side and inside whole-stage codegen, where a
  * fold-over-positions HOF spelling would be interpreted per row with
  * an O(n·chunkWords) intermediate-array cost. */
case class SentenceChunkSpans(child: Expression, chunkWords: Int,
    overlapWords: Int) extends UnaryExpression {
  require(chunkWords >= 1 && overlapWords >= 0 && overlapWords < chunkWords,
    s"need 0 <= overlapWords < chunkWords, got $overlapWords / $chunkWords")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sentence_chunk_spans requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sentence_chunk_spans"

  override def nullSafeEval(input: Any): Any =
    SentenceChunks.spans(input.asInstanceOf[ArrayData], chunkWords,
      overlapWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = SentenceChunks.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.spans($arr, $chunkWords, $overlapWords);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): SentenceChunkSpans =
    copy(child = newChild)
}

object SentenceChunks {
  /** C4 sentence-final test on one token: last code point is one of
    * `. ! ? " ”`. Byte-exact on UTF-8: the ASCII four are single
    * final bytes, and ” (U+201D) is the fixed suffix e2 80 9d. */
  def isSentenceEnd(w: UTF8String): Boolean = {
    val b = w.getBytes
    if (b.length == 0) return false
    val last = b(b.length - 1)
    last == '.' || last == '!' || last == '?' || last == '"' ||
      (b.length >= 3 && b(b.length - 3) == 0xe2.toByte &&
        b(b.length - 2) == 0x80.toByte && last == 0x9d.toByte)
  }

  def spans(arr: ArrayData, chunkWords: Int, overlapWords: Int): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[java.lang.Long]()
    if (n == 0) out.add(0L)
    else {
      var s = 0
      var done = false
      while (!done) {
        if (n - s <= chunkWords) {
          out.add((s.toLong << 32) | n.toLong)
          done = true
        } else {
          val w = s + chunkWords
          var j = w - 1
          var found = -1
          while (found < 0 && j >= s) {
            if (!arr.isNullAt(j) && isSentenceEnd(arr.getUTF8String(j)))
              found = j
            j -= 1
          }
          val e = if (found >= 0) found + 1 else w
          out.add((s.toLong << 32) | e.toLong)
          s = math.max(s + 1, e - overlapWords)
        }
      }
    }
    val res = new Array[Long](out.size)
    var i = 0
    while (i < res.length) { res(i) = out.get(i); i += 1 }
    new GenericArrayData(res)
  }
}
