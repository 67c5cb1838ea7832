package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `wordpiece_segment(word, vocabEncoded, maxInputChars)` — tokenize
  * ONE word with a WordPiece vocabulary (Wu et al., "Google's Neural
  * Machine Translation System", 2016 §4.1 — the BERT tokenizer's
  * subword stage, and with BPE + unigram-LM this completes the three
  * tokenizer families production pipelines ship): greedy
  * longest-match-first over the word's code points, where a piece
  * matching at a non-initial position must carry the `##` continuation
  * prefix in the vocabulary (the BERT convention). NO backtracking: if
  * any position has no matching piece the ENTIRE word becomes the
  * single `[UNK]` piece — exactly the reference WordpieceTokenizer's
  * `is_bad` rule — and a word longer than `maxInputChars` code points
  * is `[UNK]` outright (the reference's `max_input_chars_per_word`
  * guard: pathological tokens would otherwise cost O(n·maxPieceLen)
  * each). Deterministic by construction — greedy longest has no ties.
  *
  * Code-point positions, not UTF-16 units (the [[BpeSegment]] stance):
  * a supplementary character is one position and can never be split
  * mid-surrogate, and SQL oracles replay positions 1:1 because
  * DuckDB's substr counts code points too.
  *
  * The vocabulary arrives ENCODED as "\n"-joined pieces ([[BpeSegment]]
  * pattern — pieces are whitespace-free because words come from
  * whitespace splitting): the lookup set is built ONCE per expression
  * instance and shared by every row via a codegen reference object. */
case class WordpieceSegment(child: Expression, vocabEncoded: String,
    maxInputChars: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_segment requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_segment"

  @transient private lazy val vocab: java.util.HashSet[String] =
    WordpieceSegment.buildVocab(vocabEncoded)
  @transient private lazy val maxLen: Int =
    WordpieceSegment.maxBodyLen(vocab)

  override def nullSafeEval(input: Any): Any =
    WordpieceSegment.segment(input.asInstanceOf[UTF8String], vocab, maxLen,
      maxInputChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val vocabRef = ctx.addReferenceObj("wordpieceVocab", vocab,
        "java.util.HashSet<String>")
      val cls = WordpieceSegment.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.segment($s, $vocabRef, $maxLen, $maxInputChars);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): WordpieceSegment = copy(child = newChild)
}

object WordpieceSegment {

  /** The whole-word fallback piece. Not looked up in the vocabulary —
    * it is the OUTPUT for unmatchable words, the BERT `unk_token`. */
  val UnkPiece = "[UNK]"

  private[plans] def buildVocab(encoded: String): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    encoded.split("\n").foreach(line => if (line.nonEmpty) s.add(line))
    s
  }

  /** Longest piece BODY (continuation pieces minus their "##") in code
    * points — the greedy scan's inner-loop bound. */
  private[plans] def maxBodyLen(vocab: java.util.HashSet[String]): Int = {
    var mx = 1
    val it = vocab.iterator()
    while (it.hasNext) {
      val p = it.next()
      val body = if (p.startsWith("##")) p.substring(2) else p
      mx = math.max(mx, body.codePointCount(0, body.length))
    }
    mx
  }

  def segment(word: UTF8String, vocab: java.util.HashSet[String],
      maxLen: Int, maxInputChars: Int): ArrayData = {
    val pieces = segmentLocal(word.toString, vocab, maxLen, maxInputChars)
    val res = new Array[Any](pieces.length)
    var i = 0
    while (i < res.length) {
      res(i) = UTF8String.fromString(pieces(i)); i += 1
    }
    new GenericArrayData(res)
  }

  /** The greedy longest-match walk on plain strings — shared by the
    * expression and the driver-local trainer/spec paths so they can
    * never diverge. Returns the piece array; `[UNK]` alone when the
    * word is over-length or any position is unmatchable. */
  def segmentLocal(s: String, vocab: java.util.HashSet[String],
      maxLen: Int, maxInputChars: Int): Array[String] = {
    if (s.isEmpty) return Array.empty[String]
    // split to code points once; all positions below are code-point
    // indices so supplementary characters can never split mid-surrogate
    val cps = new java.util.ArrayList[String]()
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps.add(new String(Character.toChars(cp)))
      ci += Character.charCount(cp)
    }
    val n = cps.size
    if (n > maxInputChars) return Array(UnkPiece)
    val out = new java.util.ArrayList[String]()
    var start = 0
    while (start < n) {
      // longest body first — the first hit wins, so ties are impossible
      var l = math.min(maxLen, n - start)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val sb = new java.lang.StringBuilder()
        if (start > 0) sb.append("##")
        var j = start
        while (j < start + l) { sb.append(cps.get(j)); j += 1 }
        val cand = sb.toString
        if (vocab.contains(cand)) hit = cand
        l -= 1
      }
      if (hit == null) return Array(UnkPiece)
      out.add(hit)
      start += (if (hit.startsWith("##"))
        hit.codePointCount(2, hit.length) else hit.codePointCount(0, hit.length))
    }
    val res = new Array[String](out.size)
    out.toArray(res)
    res
  }
}
