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
  }
}
