package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: registers the custom Catalyst expressions
  * with every session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (the public
  * SparkSessionExtensions mechanism — no internal registries touched).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) =>
        FloatDotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("float_dist_sq"),
      new ExpressionInfo(classOf[FloatDistSq].getName, "float_dist_sq"),
      (children: Seq[Expression]) =>
        FloatDistSq(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) =>
        MinhashSignature(children(0), children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case other => throw new IllegalArgumentException(
              s"minhash_sig: numHashes must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "minhash_sig: numHashes must be a foldable int literal")
        })))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimhashFingerprint].getName, "simhash_fp"),
      (children: Seq[Expression]) =>
        SimhashFingerprint(children(0), children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case other => throw new IllegalArgumentException(
              s"simhash_fp: numBits must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "simhash_fp: numBits must be a foldable int literal")
        })))
  }
}
