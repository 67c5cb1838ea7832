package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd Bloom-filter BITSET kernels — the packed representation
  * the r15 verdict asked for (DedupOps.bloomBuildPositions' own doc
  * conceded the sorted-position row is ~32× the broadcast bytes of a
  * packed bitset: at the 2³⁰-bit filter a 100 TB snapshot wants,
  * 4 GiB vs 128 MiB — "switch representation before switching
  * algorithms").
  *
  * [[BitsetPack]] turns a bit-position array into `ceil(mBits/64)`
  * packed words (array<bigint>); [[BitsetCountSet]] probes: how many
  * of the given positions have their bit set. Together they replace
  * the sorted-position broadcast + `sorted_intersect_count` probe with
  * a fixed-width bitset broadcast + O(k) bit tests per document — same
  * flags, 32× smaller build side, and the probe drops from
  * O(k + bits_set) binary-merge work to k array-index + mask ops.
  *
  * The positions form stays the ORACLE representation (DuckDB replays
  * it; the m-bounded build shuffle is identical — packing happens on
  * the one gathered row), and `BloomPackedSpec` pins packed ≡
  * positions on randomized corpora.
  *
  * Both kernels share static helpers between interpreted eval and
  * codegen (the [[MinhashSignature]] pattern) so the two paths cannot
  * drift. Null ELEMENTS in a positions array are skipped (a null
  * position sets/tests nothing); out-of-range positions in
  * [[BitsetPack]] throw — a position ≥ mBits is a caller bug the build
  * must surface, not mask (mod-m hashing owns the range invariant).
  * In [[BitsetCountSet]] an out-of-range position simply tests unset,
  * mirroring how a membership probe against a foreign filter behaves.
  */
case class BitsetPack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bitset_pack requires (array<bigint>, int), got ${l.simpleString}, ${r.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitset_pack"

  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(
      BloomBitset.pack(a.asInstanceOf[ArrayData], b.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m) => {
      val w = ctx.freshName("words")
      val cls = BloomBitset.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |final long[] $w = $cls.pack($a, $m);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetPack =
    copy(left = newLeft, right = newRight)
}

/** How many of `left`'s positions have their bit set in the packed
  * bitset `right` — the probe half; see [[BitsetPack]]. */
case class BitsetCountSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bitset_count_set requires (array<bigint>, array<bigint>), got " +
        s"${l.simpleString}, ${r.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bitset_count_set"

  override def nullSafeEval(a: Any, b: Any): Any =
    BloomBitset.countSet(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = BloomBitset.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.countSet($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetCountSet =
    copy(left = newLeft, right = newRight)
}

object BloomBitset {

  /** Pack bit positions into ceil(mBits/64) little-endian-within-word
    * longs: bit p lives at word p>>6, mask 1L<<(p&63). Out-of-range
    * throws (see class doc); null elements are skipped. */
  def pack(positions: ArrayData, mBits: Int): Array[Long] = {
    require(mBits >= 1, s"bitset_pack: mBits must be >= 1, got $mBits")
    val words = new Array[Long]((mBits + 63) >>> 6)
    val n = positions.numElements()
    var i = 0
    while (i < n) {
      if (!positions.isNullAt(i)) {
        val p = positions.getLong(i)
        if (p < 0 || p >= mBits)
          throw new IllegalArgumentException(
            s"bitset_pack: position $p out of range [0, $mBits)")
        words((p >>> 6).toInt) |= 1L << (p & 63)
      }
      i += 1
    }
    words
  }

  /** Count positions whose bit is set; out-of-range or null positions
    * test unset. */
  def countSet(positions: ArrayData, words: ArrayData): Int = {
    val n = positions.numElements()
    val mBits = words.numElements().toLong << 6
    var i = 0
    var c = 0
    while (i < n) {
      if (!positions.isNullAt(i)) {
        val p = positions.getLong(i)
        if (p >= 0 && p < mBits &&
          (words.getLong((p >>> 6).toInt) & (1L << (p & 63))) != 0L) c += 1
      }
      i += 1
    }
    c
  }
}
