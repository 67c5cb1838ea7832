package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PgConversions._

/** Pure-function unit tests for the conversion parsers (no Spark). */
class PgConversionsSpec extends AnyFunSuite {

  // ---- interval parse (reference spec: py-tests/test_basic_types.py:242-280)
  test("interval: full form keeps microseconds in struct mode") {
    assert(parseInterval("1 year 2 mons 1 days 40:05:06.000001") ==
      PgIntervalParts(14, 1, 144306000001L))
  }
  test("interval: negative day with positive time") {
    assert(parseInterval("-1 days +02:03:04") == PgIntervalParts(0, -1, 7384000000L))
  }
  test("interval: months only") {
    assert(parseInterval("3 mons") == PgIntervalParts(3, 0, 0L))
  }
  test("interval: negative time part") {
    assert(parseInterval("-00:00:01.5") == PgIntervalParts(0, 0, -1500000L))
  }

  // ---- interval bytes (datatypes/interval.rs:27-44)
  test("interval: non-postgres IntervalStyle text errors, never silent zeros") {
    // iso_8601 matches neither grammar — must throw, not export zeros
    val e1 = intercept[IllegalArgumentException](parseInterval("P1Y2M3DT4H5M6S"))
    assert(e1.getMessage.contains("IntervalStyle"))
    // sql_standard would PARTIALLY match via its HMS tail, dropping the
    // year-month lead — must also throw, not export a plausible value
    val e2 = intercept[IllegalArgumentException](parseInterval("+1-2 +3 +4:05:06"))
    assert(e2.getMessage.contains("sql_standard"))
    intercept[IllegalArgumentException](parseInterval("gibberish"))
    // postgres-style zero interval still parses (prints as bare HMS)
    assert(parseInterval("00:00:00") == PgIntervalParts(0, 0, 0L))
  }

  test("interval bytes: 40h folds one day into the day field, µs truncated") {
    val b = intervalBytes(PgIntervalParts(14, 1, 144306000001L))
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(b.length == 12)
    assert(buf.getInt == 14)       // months
    assert(buf.getInt == 2)        // 1 + 1 folded day
    assert(buf.getInt == 57906000) // 16:05:06 in millis
  }

  // ---- float16 rounding (py-tests/test_pgvector.py:100-125)
  test("f16: precision edges") {
    assert(roundToFloat16(1.0001f) == 1.0f)
    assert(roundToFloat16(10001f) == 10000f)
    assert(roundToFloat16(6.0e-8f) == 5.9604645e-8f) // 2^-24 subnormal
    // the full subnormal band [2^-24, 2^-14) — numpy float16 ground
    // truth; a shift off-by-one here halves every value yet passes the
    // single 2^-24 probe above (r07 review)
    assert(roundToFloat16(3.0517578e-5f) == 3.0517578e-5f) // 2^-15, 0x0200
    assert(roundToFloat16(2.0e-5f) == 2.002716e-5f)        // 0x0150
    assert(roundToFloat16(5.2e-5f) == 5.197525e-5f)        // 0x0368
    assert(roundToFloat16(6.1e-5f) == 6.097555e-5f)        // 0x03ff max subnormal
    assert(roundToFloat16(6.2e-5f) == 6.198883e-5f)        // 0x0410 first normal
    assert(roundToFloat16(2.9e-8f) == 0.0f)                // below 2^-25 → 0
    assert(roundToFloat16(1.5f) == 1.5f)             // exactly representable
    assert(roundToFloat16(-2.5f) == -2.5f)
    assert(roundToFloat16(1e6f).isPosInfinity)       // overflows f16
    assert(roundToFloat16(Float.NaN).isNaN)
    assert(java.lang.Float.floatToRawIntBits(roundToFloat16(-0.0f)) ==
      java.lang.Float.floatToRawIntBits(-0.0f))
  }

  // ---- p>38 decimal bytes (datatypes/numeric.rs:12-17)
  test("bigDecimalBytes: two's-complement BE unscaled value at scale") {
    def hex(s: String, scale: Int) =
      bigDecimalBytes(s, scale).map(b => f"${b & 0xff}%02X").mkString
    assert(hex("1", 2) == "64")            // 1.00 → 100
    assert(hex("-1", 2) == "9C")           // -100
    assert(hex("1000.0001", 50) == "010B46C88E4142A5C5CBAE9201154CFDFA400000000000")
  }

  test("PgTypeMapper: unsupported types error with the column workaround") {
    import graft.functions.{PgTypeMapper => M}
    import org.apache.spark.sql.functions.col
    val e = intercept[IllegalArgumentException](
      M.convert("tsvector", col("c"), PgSettings()))
    assert(e.getMessage.contains("tsvector") && e.getMessage.contains("::text"))
    intercept[IllegalArgumentException](
      M.convert("numeric", col("c"), PgSettings(numericHandling = "bogus")))
  }

  // ---- record/range tokenizer (pg_custom_types.rs:84-287;
  // test_custom_types.py:135-160)
  test("composite: quote-aware fields — commas, escapes, '\"\"' ≠ NULL") {
    assert(parseComposite("(1ehz,1,A)") ==
      Seq(Some("1ehz"), Some("1"), Some("A")))
    assert(parseComposite("(,,)") == Seq(None, None, None))
    assert(parseComposite("(\"a,b\",7,\"q\"\"x\")") ==
      Seq(Some("a,b"), Some("7"), Some("q\"x")))
    assert(parseComposite("(\"c\\\\d\",-1,\"(e)\")") ==
      Seq(Some("c\\d"), Some("-1"), Some("(e)")))
    assert(parseComposite("(\"\",8,)") == Seq(Some(""), Some("8"), None))
    assert(parseComposite("(\"a\\\"b\",x)") == Seq(Some("a\"b"), Some("x")))
    val e = intercept[IllegalArgumentException](parseComposite("(\"unterminated"))
    assert(e.getMessage.contains("unterminated"))
  }
  test("range: quoted bounds with embedded commas and quotes") {
    assert(parseRange("empty") == PgRangeParts(None, None, false, false, true))
    assert(parseRange("[1,5)") ==
      PgRangeParts(Some("1"), Some("5"), true, false, false))
    assert(parseRange("(,)") == PgRangeParts(None, None, false, false, false))
    assert(parseRange("[\"2020-01-01 00:00:00\",\"2020-06-30 12:00:00\")") ==
      PgRangeParts(Some("2020-01-01 00:00:00"), Some("2020-06-30 12:00:00"),
        true, false, false))
    // text range: bound with a comma and an escaped quote stays one bound
    assert(parseRange("[\"a,b\",\"c\\\"d\"]") ==
      PgRangeParts(Some("a,b"), Some("c\"d"), true, true, false))
    // quoted empty string bound is a real '' bound, not infinite
    assert(parseRange("[\"\",z)") == PgRangeParts(Some(""), Some("z"), true, false, false))
    intercept[IllegalArgumentException](parseRange("1,5"))
  }

  // ---- multidim array parse (postgres_cloner.rs:843-893; test_arrays.py:94-131)
  test("multidim: 2-D with NULL element, row-major flatten") {
    val r = parseMultidim("{{1,2},{3,4},{NULL,5}}")
    assert(r.data == Seq(Some("1"), Some("2"), Some("3"), Some("4"), None, Some("5")))
    assert(r.dims == Seq(3L, 2L))
    assert(r.lower_bound == Seq(1, 1))
  }
  test("multidim: explicit negative lower bound") {
    val r = parseMultidim("[-2:0]={1,2,3}")
    assert(r.data == Seq(Some("1"), Some("2"), Some("3")))
    assert(r.dims == Seq(3L))
    assert(r.lower_bound == Seq(-2))
  }
  test("multidim: deep singleton and empty") {
    assert(parseMultidim("{{{1}}}").dims == Seq(1L, 1L, 1L))
    val e = parseMultidim("{}")
    assert(e.data.isEmpty && e.dims.isEmpty && e.lower_bound.isEmpty)
  }
}
