package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** [[SortedIntersectCount]] with a THRESHOLD and early exit: returns
  * the exact |A ∩ B| when it is ≥ `min`, and -1 as soon as the merge
  * can prove it cannot be — when matches-so-far + min(remaining a,
  * remaining b) drops below `min`, no suffix of the merge can recover,
  * so the loop bails without scanning the tails.
  *
  * This is the merge-level form of PPJoin's suffix pruning (Xiao et
  * al., "Efficient Similarity Joins for Near-Duplicate Detection",
  * WWW'08 §4.3): the n-gram Jaccard verify stage only needs the exact
  * count for pairs that can still MEET the per-pair overlap threshold
  * ⌈t/(1+t)(|a|+|b|)⌉; for the (majority) candidates far below it the
  * bail fires early in the scan. Exactness contract: -1 is returned
  * ONLY when |A ∩ B| < min (the bound is an invariant upper bound on
  * the final count), and any return ≥ 0 is the exact intersection
  * size — so `sorted_intersect_atleast(a, b, need)` composed with a
  * final exact-jaccard filter admits exactly the same pairs as
  * `sorted_intersect_count(a, b)`: a -1 yields a negative jaccard,
  * which the ≥ t filter drops, and those pairs were below threshold
  * by the bound. `min ≤ 0` never bails (count + remaining ≥ 0).
  *
  * Same input invariants as [[SortedIntersectCount]]: ascending long
  * arrays, nulls first, per-document distinct elements; the leading
  * null runs match once, counted before the bail check arms. */
case class SortedIntersectAtLeast(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_atleast requires (array<bigint>, array<bigint>, " +
        s"int), got ${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_atleast"

  override def nullSafeEval(a: Any, b: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val min = m.asInstanceOf[Int]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && x.isNullAt(i)) i += 1
    while (j < ny && y.isNullAt(j)) j += 1
    if (i > 0 && j > 0) c += 1
    var bail = false
    while (!bail && i < nx && j < ny) {
      // upper bound on the final count: every further match consumes
      // one element from EACH side, so c + min(remaining) is invariant
      // non-increasing — once below `min`, -1 is proven
      if (c + math.min(nx - i, ny - j) < min) bail = true
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    }
    if (bail || c < min) -1 else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val rem = ctx.freshName("rem")
      val bail = ctx.freshName("bail")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |boolean $bail = false;
         |while ($i < $nx && $a.isNullAt($i)) { $i++; }
         |while ($j < $ny && $b.isNullAt($j)) { $j++; }
         |if ($i > 0 && $j > 0) { $c++; }
         |while (!$bail && $i < $nx && $j < $ny) {
         |  final int $rem = ($nx - $i < $ny - $j) ? ($nx - $i) : ($ny - $j);
         |  if ($c + $rem < $m) { $bail = true; }
         |  else {
         |    final long $xv = $a.getLong($i);
         |    final long $yv = $b.getLong($j);
         |    if ($xv < $yv) { $i++; }
         |    else if ($xv > $yv) { $j++; }
         |    else { $c++; $i++; $j++; }
         |  }
         |}
         |${ev.value} = ($bail || $c < $m) ? -1 : $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedIntersectAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)
}
