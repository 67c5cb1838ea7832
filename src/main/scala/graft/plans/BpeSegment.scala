package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_segment(word, mergesEncoded)` — tokenize ONE word with a
  * learned BPE merge list ([[graft.operators.Pipeline.bpeTrain]]
  * output): start from code points (+ '</w>'), repeatedly merge every
  * occurrence of the best-ranked adjacent pair until none applies —
  * the standard tokenizer-runtime algorithm, equivalent to applying
  * the merges in training order (a merge can never create an
  * occurrence of an EARLIER-trained pair, because earlier pairs are
  * defined over symbols that existed before the later merge's output
  * symbol did).
  *
  * The merge list arrives ENCODED in a foldable string ("l r" lines —
  * symbols never contain whitespace, they come from whitespace-split
  * words), so the rank table is built ONCE per expression instance and
  * shared by every row via a codegen reference object — no per-row
  * parsing, no per-row hashing of the merge table. The encoded list is
  * `numMerges`-bounded (driver-collected like centroid tables — a
  * 32k-merge vocabulary is ~300 KB). */
case class BpeSegment(child: Expression, mergesEncoded: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeSegment.buildTable(mergesEncoded)

  override def nullSafeEval(input: Any): Any =
    BpeSegment.segment(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val mapRef = ctx.addReferenceObj("bpeRanks", ranks,
        "java.util.HashMap<String, Integer>")
      val cls = BpeSegment.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.segment($s, $mapRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

/** `bpe_encode_ids(word, mergesEncoded, vocabEncoded)` — tokenize ONE
  * word like [[BpeSegment]] (same baked rank table, same greedy
  * best-ranked-pair loop), then map each output symbol to its integer
  * id through a second baked table: the vocabulary arrives as a
  * foldable "\n"-joined symbol list whose LINE INDEX is the id (the
  * SentencePiece/HF vocab-file convention —
  * [[graft.operators.Pipeline.bpeVocab]] builds it as sorted base
  * symbols followed by merge outputs in rank order). Symbols absent
  * from the vocabulary encode as -1 (the UNK sentinel; an id can never
  * legitimately be negative) so out-of-alphabet input surfaces loudly
  * instead of shifting every downstream id. Both tables are built once
  * per expression instance and shared across rows via codegen
  * reference objects — per row there is no parsing, no join, no
  * shuffle. */
case class BpeEncodeIds(child: Expression, mergesEncoded: String,
    vocabEncoded: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids requires string, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeSegment.buildTable(mergesEncoded)
  @transient private lazy val ids: java.util.HashMap[String, Integer] =
    BpeSegment.buildTable(vocabEncoded)

  override def nullSafeEval(input: Any): Any =
    BpeSegment.encodeIds(input.asInstanceOf[UTF8String], ranks, ids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
        "java.util.HashMap<String, Integer>")
      val idsRef = ctx.addReferenceObj("bpeVocabIds", ids,
        "java.util.HashMap<String, Integer>")
      val cls = BpeSegment.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.encodeIds($s, $ranksRef, $idsRef);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

object BpeSegment {
  /** Line → line-index table shared by the merge-rank and vocab-id
    * maps. First occurrence wins: trained merge lists and built
    * vocabularies never duplicate, but a HAND-BUILT table with a
    * repeated line must keep the FIRST (lowest) index like standard
    * tokenizer runtimes — put() would silently take the last (ADVICE
    * r11). The dup line still consumes its slot so later lines keep
    * their index. */
  private[plans] def buildTable(encoded: String)
      : java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    encoded.split("\n").foreach { line =>
      if (line.nonEmpty) { m.putIfAbsent(line, Integer.valueOf(i)); i += 1 }
    }
    m
  }

  /** [[segment]] + symbol→id mapping in one pass; unknown → -1. */
  def encodeIds(word: UTF8String, ranks: java.util.HashMap[String, Integer],
      ids: java.util.HashMap[String, Integer]): ArrayData = {
    val syms = segment(word, ranks)
    val n = syms.numElements()
    val res = new Array[Int](n)
    var i = 0
    while (i < n) {
      val id = ids.get(syms.getUTF8String(i).toString)
      res(i) = if (id == null) -1 else id.intValue()
      i += 1
    }
    new GenericArrayData(res)
  }

  /** One word → its BPE symbols. Greedy: find the best (lowest) rank
    * among adjacent pairs, merge ALL its occurrences left-to-right,
    * repeat. Code-point splitting matches the trainer's
    * `substr(w, i, 1)` start symbols. */
  def segment(word: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = word.toString
    val syms = new java.util.ArrayList[String]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    syms.add("</w>")
    var done = false
    while (!done && syms.size > 1) {
      // best-ranked adjacent pair present in the word
      var bestRank = Int.MaxValue
      var bestL: String = null
      var bestR: String = null
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue()
          bestL = syms.get(j)
          bestR = syms.get(j + 1)
        }
        j += 1
      }
      if (bestL == null) done = true
      else {
        // merge every occurrence, left-to-right non-overlapping
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k + 1 < syms.size && syms.get(k) == bestL &&
            syms.get(k + 1) == bestR) {
            out.add(bestL + bestR); k += 2
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms.clear()
        syms.addAll(out)
      }
    }
    val res = new Array[Any](syms.size)
    var m = 0
    while (m < res.length) { res(m) = UTF8String.fromString(syms.get(m)); m += 1 }
    new GenericArrayData(res)
  }
}
