package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Spark-side value AND schema assertions for the §2.3 fixture queries —
  * the py-tests pattern (wrappers.py:123-129: values via one reader,
  * logical types via another) applied to the engine's own output.
  *
  * The driver-registered queries flatten nested values to scalar strings
  * (the driver's comparator can't hash nested cells — QueryDef.canonArray
  * scaladoc); the REAL nested shapes live in Types.tNNNested and are
  * asserted here, including a write→read round-trip through the parquet
  * sink so Spark's Dremel shredding (O9–O15) is exercised end-to-end.
  */
class TypesFixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** parquet carries no not-null enforcement — normalize nullability
    * recursively so only the logical types are compared. */
  private def nullable(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = nullable(f.dataType), nullable = true)))
    case at: ArrayType => at.copy(elementType = nullable(at.elementType),
      containsNull = true)
    case mt: MapType => mt.copy(valueType = nullable(mt.valueType),
      valueContainsNull = true)
    case other => other
  }

  /** parquet round-trip: same schema and same values back. */
  private def roundtrip(df: DataFrame, name: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$name").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(nullable(back.schema) == nullable(df.schema),
      s"$name: schema changed through sink")
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq,
      s"$name: values changed through sink")
    back
  }

  test("t03: decimal schema is DecimalType at all three widths; NaN→NULL") {
    val df = graft.operators.Types.t03Nested(spark).orderBy("id")
    assert(df.schema("d38").dataType == DecimalType(38, 18))
    assert(df.schema("d18").dataType == DecimalType(18, 9))
    assert(df.schema("d9").dataType == DecimalType(9, 4))
    val rows = df.collect()
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3)) // NaN
    assert(rows(3).isNullAt(2) && rows(3).isNullAt(3)) // overflow at p18/p9
    assert(rows(3).getDecimal(1) != null)              // fits p38
    // exact-bound decisions (r04 verdict #4): 18 significant digits just
    // under 1e9 must survive (18,9); a rounding carry past the bound must
    // NULL, not throw
    assert(rows(6).getDecimal(2).toPlainString == "999999999.999999999")
    assert(rows(7).getDecimal(3) == null)              // 99999.99996 → (9,4) carry
    assert(rows(7).getDecimal(2).toPlainString == "99999.999960000")
    roundtrip(df, "t03")
  }

  test("t08: interval struct schema and exact parts") {
    val df = graft.operators.Types.t08Nested(spark).orderBy("id")
    val st = df.schema("interval_v").dataType.asInstanceOf[StructType]
    assert(st.fields.map(f => (f.name, f.dataType)).toSeq == Seq(
      ("months", IntegerType), ("days", IntegerType), ("microseconds", LongType)))
    val r = df.collect()(0).getStruct(1)
    assert(r == Row(14, 1, 144306000001L))
    roundtrip(df, "t08")
  }

  test("t11: empty range ≠ infinite range") {
    val df = graft.operators.Types.t11Nested(spark).orderBy("id")
    val rows = df.collect()
    val empty = rows(1).getStruct(1)    // 'empty'
    val infinite = rows(2).getStruct(1) // '(,)'
    assert(empty.getBoolean(4) && !infinite.getBoolean(4)) // is_empty
    assert(empty.isNullAt(0) && infinite.isNullAt(0))      // both NULL bounds
    roundtrip(df, "t11")
  }

  test("t13: all-NULL-fields composite is a non-NULL struct") {
    val df = graft.operators.Types.t13Nested(spark).orderBy("id")
    val rows = df.collect()
    assert(rows(1).isNullAt(1))         // NULL composite
    val allNull = rows(2).getStruct(1)  // '(,,)'
    assert(allNull != null && allNull.isNullAt(0) && allNull.isNullAt(1) && allNull.isNullAt(2))
    // quote-aware record grammar: embedded comma, '""' escape, and the
    // quoted empty string ≠ NULL field
    assert(rows(4).getStruct(1).getString(0) == "a,b")
    assert(rows(4).getStruct(1).getString(2) == "q\"x")
    assert(rows(5).getStruct(1).getString(0) == "")
    assert(rows(5).getStruct(1).isNullAt(2))
    assert(rows(6).getStruct(1).getString(0) == "c\\d")
    roundtrip(df, "t13")
  }

  test("t14: NULL array ≠ empty array ≠ [NULL], preserved through the sink") {
    val df = graft.operators.Types.t14Nested(spark).orderBy("id")
    assert(df.schema("int_arr").dataType == ArrayType(IntegerType))
    val rows = roundtrip(df, "t14").orderBy("id").collect()
    assert(rows(1).isNullAt(2))                      // NULL array
    assert(rows(2).getSeq[Int](2).isEmpty)           // empty array
    assert(rows(2).getSeq[Any](3) == Seq(null))      // [NULL]
    assert(rows(3).getSeq[Any](3).head == null)      // NaN elem → NULL elem
  }

  test("t15: multidim struct{data,dims,lower_bound} with negative lower bound") {
    val df = graft.operators.Types.t15Nested(spark).orderBy("id")
    val st = df.schema("arr_v").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("data", "dims", "lower_bound"))
    val rows = df.collect()
    assert(rows(0).getStruct(1).getSeq[Any](0) == Seq(1L, 2L, 3L, 4L, null, 5L))
    assert(rows(2).getStruct(1).getSeq[Int](2) == Seq(-2))
    // generic (text) subtype: quoted comma element, SQL NULL element,
    // and the quoted "NULL" string all survive
    assert(rows(0).getStruct(2).getSeq[Any](0) == Seq("a", "x,y", null, "d"))
    assert(rows(4).getStruct(2).getSeq[Any](0) == Seq("NULL", null))
    roundtrip(df, "t15")
  }

  test("t17: sparsevec map schema, 1-based keys, empty map ≠ NULL") {
    val df = graft.operators.Types.t17Nested(spark).orderBy("id")
    assert(df.schema("sparse_v").dataType.asInstanceOf[MapType].keyType == IntegerType)
    val rows = df.collect()
    assert(rows(0).getMap[Int, Float](1) == Map(1 -> -1.0f, 5 -> 5.25f))
    assert(rows(1).getMap[Int, Float](1).isEmpty)
    assert(rows(2).isNullAt(1))
    // MapType round-trip (schema + per-row values; Maps compare by value)
    val dir = java.nio.file.Files.createTempDirectory("graft-t17").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).orderBy("id").collect()
    assert(back(1).getMap[Int, Float](1).isEmpty && back(2).isNullAt(1))
    assert(back(0).getMap[Int, Float](1) == Map(1 -> -1.0f, 5 -> 5.25f))
  }

  test("t16: vector floats exact; halfvec rounded through f16") {
    val df = graft.operators.Types.t16Nested(spark).orderBy("id")
    val rows = df.collect()
    assert(rows(0).getSeq[Float](1) == Seq(1f, 2f, 3f))
    assert(rows(0).getSeq[Float](2) == Seq(1.0f, 10000f))
    roundtrip(df, "t16")
  }

  test("t23: quote-aware array grammar — ranges, enums, quoted NULL") {
    val df = graft.operators.Types.t23Nested(spark).orderBy("id")
    // array⟨struct⟩ schema for the range array
    val st = df.schema("range_arr").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq(
      "lower", "upper", "lower_inclusive", "upper_inclusive", "is_empty"))
    val rows = roundtrip(df, "t23").orderBy("id").collect()
    assert(rows(0).getSeq[Row](1).head == Row(1, 3, true, false, false))
    assert(rows(1).getSeq[Any](1)(1) == null)          // NULL range element
    assert(rows(0).getSeq[Int](2) == Seq(1, 7))        // enum→int elements
    // quoted "NULL" stays the string; unquoted NULL is SQL null
    assert(rows(1).getSeq[Any](3) == Seq(null, "NULL", "plain"))
    // embedded comma and escaped quote survive
    assert(rows(0).getSeq[String](3) == Seq("a,b", "c\"d"))
    assert(rows(3).getSeq[Any](1).isEmpty)             // '{}' → empty
  }

  test("t18: list⟨struct⟨list⟩⟩ schema with nulls at every level") {
    val df = graft.operators.Types.t18Nested(spark).orderBy("id")
    val at = df.schema("wrappers").dataType.asInstanceOf[ArrayType]
    val st = at.elementType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("single", "half"))
    val rows = roundtrip(df, "t18").orderBy("id").collect()
    assert(rows(1).isNullAt(2))                        // NULL list
    assert(rows(2).getSeq[Any](2).last == null)        // [struct, NULL]
  }

  test("canonMap is injective on ':'-bearing keys/values; plain maps unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the bare-cast key (and a ':'-less value trigger) let distinct
    // maps collide: map("k:a"->"b") and map("k"->"a:b") both rendered
    // "{k:a:b}" — a false-pass class in the driver comparator
    def enc(m: Map[String, String]): String =
      Seq(1).toDF("i").select(QueryDef.canonMap(
        typedLit(m)).as("s")).collect()(0).getString(0)
    assert(enc(Map("k:a" -> "b")) != enc(Map("k" -> "a:b")))
    assert(enc(Map("k:a" -> "b")) == "{\"k:a\":b}")
    assert(enc(Map("k" -> "a:b")) == "{k:\"a:b\"}")
    // keys/values without special characters keep the old encoding (the
    // gated q36/t17 oracles rely on plain k:v aggregation)
    assert(enc(Map("O" -> "7", "F" -> "2")) == "{F:2,O:7}")
  }

  test("events ts: ns→µs uses FLOOR division like DuckDB, not toward-zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a pre-1970 nanosecond timestamp: -1 ns must land at -1 µs
    // (1969-12-31T23:59:59.999999), where `div` truncation gives 0
    val dir = java.nio.file.Files.createTempDirectory("evfloor").toString
    Seq((-1L, 1L), (1999L, 2L), (-1999L, 3L))
      .toDF("ts", "user_id").write.parquet(s"$dir/events.parquet")
    val out = Tables.events(spark, dir).orderBy("user_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(-1L, 1L, -2L),
      s"expected floor semantics (DuckDB ns→µs cast: -1ns → -1µs), got $out")
  }
}
