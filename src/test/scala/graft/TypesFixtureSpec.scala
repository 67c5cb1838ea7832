package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Spark-side value AND schema assertions for the §2.3 fixture queries —
  * the py-tests pattern (wrappers.py:123-129: values via one reader,
  * logical types via another) applied to the engine's own output. */
class TypesFixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("t03: decimal schema is DecimalType at all three widths; NaN→NULL") {
    val df = run("t03_numeric_decimal")
    assert(df.schema("d38").dataType == DecimalType(38, 18))
    assert(df.schema("d18").dataType == DecimalType(18, 9))
    assert(df.schema("d9").dataType == DecimalType(9, 4))
    val rows = df.collect()
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3)) // NaN
    assert(rows(3).isNullAt(2) && rows(3).isNullAt(3)) // overflow at p18/p9
    assert(rows(3).getDecimal(1) != null)              // fits p38
  }

  test("t08: interval struct schema and exact parts") {
    val df = run("t08_interval_struct")
    val st = df.schema("interval_v").dataType.asInstanceOf[StructType]
    assert(st.fields.map(f => (f.name, f.dataType)).toSeq == Seq(
      ("months", IntegerType), ("days", IntegerType), ("microseconds", LongType)))
    val r = df.collect()(0).getStruct(1)
    assert(r == Row(14, 1, 144306000001L))
  }

  test("t11: empty range ≠ infinite range") {
    val rows = run("t11_range_int4").collect()
    val empty = rows(1).getStruct(1)    // 'empty'
    val infinite = rows(2).getStruct(1) // '(,)'
    assert(empty.getBoolean(4) && !infinite.getBoolean(4)) // is_empty
    assert(empty.isNullAt(0) && infinite.isNullAt(0))      // both NULL bounds
  }

  test("t13: all-NULL-fields composite is a non-NULL struct") {
    val rows = run("t13_composite").collect()
    assert(rows(1).isNullAt(1))         // NULL composite
    val allNull = rows(2).getStruct(1)  // '(,,)'
    assert(allNull != null && allNull.isNullAt(0) && allNull.isNullAt(1) && allNull.isNullAt(2))
  }

  test("t14: NULL array ≠ empty array ≠ [NULL]") {
    val df = run("t14_arrays_nulls")
    assert(df.schema("int_arr").dataType == ArrayType(IntegerType))
    val rows = df.collect()
    assert(rows(1).isNullAt(2))                      // NULL array
    assert(rows(2).getSeq[Int](2).isEmpty)           // empty array
    assert(rows(2).getSeq[Any](3) == Seq(null))      // [NULL]
    assert(rows(3).getSeq[Any](3).head == null)      // NaN elem → NULL elem
  }

  test("t17: sparsevec map schema, 1-based keys, empty map ≠ NULL") {
    val df = run("t17_sparsevec")
    assert(df.schema("sparse_v").dataType.asInstanceOf[MapType].keyType == IntegerType)
    val rows = df.collect()
    assert(rows(0).getMap[Int, Float](1) == Map(1 -> -1.0f, 5 -> 5.25f))
    assert(rows(1).getMap[Int, Float](1).isEmpty)
    assert(rows(2).isNullAt(1))
  }

  test("t16: vector floats exact; halfvec rounded through f16") {
    val rows = run("t16_pgvector").collect()
    assert(rows(0).getSeq[Float](1) == Seq(1f, 2f, 3f))
    assert(rows(0).getSeq[Float](2) == Seq(1.0f, 10000f))
  }

  test("t18: list⟨struct⟨list⟩⟩ schema with nulls at every level") {
    val df = run("t18_nested_vectors")
    val at = df.schema("wrappers").dataType.asInstanceOf[ArrayType]
    val st = at.elementType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("single", "half"))
    val rows = df.collect()
    assert(rows(1).isNullAt(2))                        // NULL list
    assert(rows(2).getSeq[Any](2).last == null)        // [struct, NULL]
  }
}
