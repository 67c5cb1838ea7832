package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization (`java.text.Normalizer`) — the
  * canonical-composition pass a crawl corpus needs BEFORE any
  * content-hash dedup: the same visible text arrives both precomposed
  * (U+00E9) and decomposed (U+0065 U+0301) from different encoders,
  * and without normalization those are different md5s, different
  * shingles, different Bloom positions — silent dedup misses. DuckDB
  * ships the same algorithm as `nfc_normalize`, so the p108 gate
  * certifies the two engines compose identically.
  *
  * NULL in → NULL out; the JDK's Normalizer is the reference
  * implementation of UAX #15, shared between interpreted eval and
  * codegen through one static helper so the paths cannot drift. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.normalize($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: already-NFC text (the overwhelming majority of a real
    // corpus) skips the composing pass entirely
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
