package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd sorted-merge intersection COUNT of two ascending long
  * arrays.
  *
  * The n-gram Jaccard verify stage needs only |A ∩ B|, never the
  * intersection itself; `size(array_intersect(a, b))` builds a hash
  * set AND materializes the result array per candidate pair — per-row
  * allocation on the hottest path of the suite's most expensive
  * operator. With both inputs sorted ascending (the caller sorts once
  * per document, not per pair), the count is a two-pointer merge:
  * O(|a|+|b|), zero allocation, branch-friendly, inside whole-stage
  * codegen. Duplicate elements are counted like array_intersect
  * counts them (set semantics) because the caller's arrays are
  * per-document DISTINCT gram ids — the merge advances both cursors
  * on a match, so equal runs of length one are the contract.
  *
  * Elements must be sorted ascending with nulls FIRST —
  * `sort_array`'s ascending default, and true by construction for the
  * gram-id arrays (built by sort_array over distinct non-null ids).
  * Null elements follow array_intersect's set semantics: a null on
  * both sides counts as one match (the leading null runs are skipped,
  * contributing 1 iff both sides had one), so the function stays a
  * drop-in for `size(array_intersect(a, b))` even though it is also
  * registered session-wide as SQL `sorted_intersect_count`. Violating
  * the sort order silently undercounts — the caller owns the
  * invariant (stated at the one call site).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    // leading null runs (nulls sort first): null matches null, once
    while (i < nx && x.isNullAt(i)) i += 1
    while (j < ny && y.isNullAt(j)) j += 1
    if (i > 0 && j > 0) c += 1
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $a.isNullAt($i)) { $i++; }
         |while ($j < $ny && $b.isNullAt($j)) { $j++; }
         |if ($i > 0 && $j > 0) { $c++; }
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
