package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_segment(word, piecesEncoded, unkScore)` — segment ONE word
  * with a unigram-LM piece table (Kudo, "Subword Regularization", ACL
  * 2018 §3 — the SentencePiece unigram model's serving path): Viterbi
  * over the word's character positions maximizing the summed piece
  * scores (log-probabilities in a trained table; any additive score in
  * a hand-built one). On a score TIE the longer last piece wins at
  * every DP position — a fixed deterministic rule so reruns and
  * engines can never disagree. A position no table piece reaches falls
  * back to a single-character UNK piece at `unkScore` (emitted as the
  * character itself), so every word segments — coverage never depends
  * on the table. Returns struct<pieces: array<string>, score: double>;
  * the score is the left-to-right sum along the chosen path (the same
  * association order a SQL path-enumeration oracle sums in, so
  * integer-valued table scores replay bit-exactly).
  *
  * The piece table arrives ENCODED in a foldable "piece score" lines
  * string ([[graft.operators.Pipeline.unigramSegment]] builds it from
  * a vocab-bounded collect, like the BPE merge list at
  * [[BpeSegment]]): parsed ONCE per expression instance and shared by
  * every row via codegen reference objects — no per-row parsing. */
case class UnigramSegment(child: Expression, piecesEncoded: String,
    unkScore: Double) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("score", DoubleType, nullable = false)))
  override def prettyName: String = "unigram_segment"

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] =
    UnigramSegment.buildTable(piecesEncoded)
  @transient private lazy val maxLen: Int = UnigramSegment.maxPieceLen(table)

  override def nullSafeEval(input: Any): Any =
    UnigramSegment.segment(input.asInstanceOf[UTF8String], table, maxLen,
      unkScore)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val tableRef = ctx.addReferenceObj("unigramTable", table,
        "java.util.HashMap<String, Double>")
      val cls = UnigramSegment.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.segment($s, $tableRef, $maxLen, $unkScore);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramSegment {
  /** "piece score" lines → score map. Pieces never contain whitespace
    * (they come from whitespace-split words); first occurrence of a
    * duplicated piece wins, the [[BpeSegment.buildTable]] stance. */
  private[plans] def buildTable(encoded: String)
      : java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    encoded.split("\n").foreach { line =>
      if (line.nonEmpty) {
        val sp = line.lastIndexOf(' ')
        require(sp > 0, s"unigram table line without a score: '$line'")
        m.putIfAbsent(line.substring(0, sp),
          java.lang.Double.valueOf(line.substring(sp + 1)))
      }
    }
    m
  }

  private[plans] def maxPieceLen(
      table: java.util.HashMap[String, java.lang.Double]): Int = {
    var mx = 1
    val it = table.keySet().iterator()
    while (it.hasNext) mx = math.max(mx, it.next().length)
    mx
  }

  /** One word → (pieces, score) as an InternalRow. */
  def segment(word: UTF8String,
      table: java.util.HashMap[String, java.lang.Double],
      maxLen: Int, unkScore: Double): InternalRow = {
    val (pieces, score) = segmentLocal(word.toString, table, maxLen, unkScore)
    val arr: Array[Any] = pieces.map(UTF8String.fromString(_: String))
    new GenericInternalRow(Array[Any](new GenericArrayData(arr), score))
  }

  /** The Viterbi DP on plain strings — shared by the expression and
    * the driver-local trainer loop so the two can never diverge.
    * best(i) = the maximal score over segmentations of word(0,i);
    * ties prefer the longer last piece. The UNK fallback fires only
    * when NO table piece reaches position i (best stays −∞), and
    * best(i−1) is always reachable by induction, so the DP never
    * strands. */
  def segmentLocal(s: String,
      table: java.util.HashMap[String, java.lang.Double],
      maxLen: Int, unkScore: Double): (Array[String], Double) = {
    val n = s.length
    if (n == 0) return (Array.empty[String], 0.0)
    val best = new Array[Double](n + 1)
    val from = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val maxL = math.min(maxLen, i)
      while (l <= maxL) {
        val st = i - l
        if (best(st) != Double.NegativeInfinity) {
          val sc = table.get(s.substring(st, i))
          if (sc != null) {
            val cand = best(st) + sc.doubleValue()
            // strict > plus ascending l: on equal scores the LAST
            // (longest) candidate to qualify wins via >=
            if (cand > best(i) ||
              (cand == best(i) && l > i - from(i))) {
              best(i) = cand
              from(i) = st
            }
          }
        }
        l += 1
      }
      if (best(i) == Double.NegativeInfinity) {
        best(i) = best(i - 1) + unkScore
        from(i) = i - 1
      }
      i += 1
    }
    var cnt = 0
    var j = n
    while (j > 0) { cnt += 1; j = from(j) }
    val out = new Array[String](cnt)
    j = n
    var k = cnt - 1
    while (j > 0) { out(k) = s.substring(from(j), j); k -= 1; j = from(j) }
    (out, best(n))
  }
}
