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

  // ==== r18: PG text-grammar round-trip fuzz (r17 verdict Next #4) ====
  // The examples above are spot checks; these properties serialize
  // RANDOM values through a PG-faithful text serializer (the exact
  // output grammar PG's record_out/range_out/array_out emit, with the
  // quoting/escape CHOICES PG leaves open randomized adversarially)
  // and require the parity parser to invert it bit-for-bit:
  // parse(serialize(v)) == v, >=10^4 cases across the four grammars.
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def check(p: Prop, n: Int): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  // adversarial content: every trigger character of all four grammars,
  // the NULL token and case variants, escape lead-ins, unicode
  private val piece = Gen.oneOf("", "NULL", "null", "NUL", "NULLX", ",",
    "{", "}", "(", ")", "[", "]", "\"", "\\", ":", "=", " ", "\t", "a",
    "b9", "\\\"", "\"\"", "a,b", "{1,2}", "[0:2]=", "😀", "é", "é")
  private val content: Gen[String] =
    Gen.choose(0, 4).flatMap(k => Gen.listOfN(k, piece)).map(_.mkString)

  /** Quote a token for the splitQuotedFields grammar (composite/range).
    * PG accepts BOTH escape spellings inside quotes — backslash and
    * doubling — so pick per character from the style bits. */
  private def quoteField(s: String, style: Long): String = {
    val sb = new StringBuilder("\"")
    s.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '"' =>
          sb.append(if (((style >> (i % 60)) & 1L) == 0L) "\\\"" else "\"\"")
        case '\\' => sb.append("\\\\")
        case other => sb.append(other)
      }
    }
    sb.append('"').toString
  }

  /** Quote a token for the ARRAY grammar — backslash escaping only
    * (PG's array_out never doubles quotes, and doubled quotes are not
    * valid array-element syntax). */
  private def quoteArrayElem(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    } + "\""

  private def compositeNeedsQuote(s: String): Boolean =
    s.isEmpty || s.exists(c => "(),\"\\ \t".indexOf(c.toInt) >= 0)
  private def rangeNeedsQuote(s: String): Boolean =
    s.isEmpty || s.exists(c => "()[],\"\\ \t".indexOf(c.toInt) >= 0)
  private def arrayNeedsQuote(s: String): Boolean =
    s.isEmpty || s.equalsIgnoreCase("null") ||
      s.exists(c => "{},\"\\ \t".indexOf(c.toInt) >= 0)

  test("fuzz parseComposite: value -> record_out text -> parse round-trips " +
      "(adversarial quoting, both escape styles, NULL vs '' vs \"NULL\")") {
    val field = Gen.frequency(1 -> Gen.const(None), 4 -> content.map(Some(_)))
    val gen = for {
      fs <- Gen.choose(1, 5).flatMap(k => Gen.listOfN(k, field))
      style <- Gen.choose(Long.MinValue, Long.MaxValue)
      force <- Gen.choose(0, 3) // sometimes quote even when unneeded
    } yield (fs, style, force)
    check(Prop.forAll(gen) { case (fs, style, force) =>
      val txt = fs.map {
        case None => ""
        case Some(s) if compositeNeedsQuote(s) || force == 0 =>
          quoteField(s, style)
        case Some(s) => s
      }.mkString("(", ",", ")")
      parseComposite(txt) == fs
    }, n = 3000)
  }

  test("fuzz parseRange: value -> range_out text -> parse round-trips " +
      "(infinite vs quoted-empty bounds, inclusivity flags, empty)") {
    val bound = Gen.frequency(1 -> Gen.const(None), 3 -> content.map(Some(_)))
    val gen = for {
      empty <- Gen.frequency(1 -> Gen.const(true), 9 -> Gen.const(false))
      lo <- bound; hi <- bound
      loInc <- Gen.oneOf(true, false); hiInc <- Gen.oneOf(true, false)
      style <- Gen.choose(Long.MinValue, Long.MaxValue)
      force <- Gen.choose(0, 3)
    } yield (empty, lo, hi, loInc, hiInc, style, force)
    check(Prop.forAll(gen) { case (empty, lo, hi, loInc, hiInc, style, force) =>
      if (empty) parseRange("empty") == PgRangeParts(None, None,
        lower_inclusive = false, upper_inclusive = false, is_empty = true)
      else {
        def b(v: Option[String]) = v match {
          case None => ""
          case Some(s) if rangeNeedsQuote(s) || force == 0 =>
            quoteField(s, style)
          case Some(s) => s
        }
        val txt = (if (loInc) "[" else "(") + b(lo) + "," + b(hi) +
          (if (hiInc) "]" else ")")
        parseRange(txt) == PgRangeParts(lo, hi, loInc, hiInc, is_empty = false)
      }
    }, n = 3000)
  }

  test("fuzz parsePgArray1D: value -> array_out text -> parse round-trips " +
      "(NULL token vs quoted \"NULL\", bounds decoration, empty array)") {
    val elem = Gen.frequency(1 -> Gen.const(None), 4 -> content.map(Some(_)))
    val gen = for {
      es <- Gen.choose(0, 6).flatMap(k => Gen.listOfN(k, elem))
      force <- Gen.choose(0, 3)
      lb <- Gen.choose(-3, 3)
      deco <- Gen.oneOf(true, false)
    } yield (es, force, lb, deco)
    check(Prop.forAll(gen) { case (es, force, lb, deco) =>
      val body = es.map {
        case None => "NULL"
        case Some(s) if arrayNeedsQuote(s) || force == 0 => quoteArrayElem(s)
        case Some(s) => s
      }.mkString("{", ",", "}")
      val txt = if (deco && es.nonEmpty)
        s"[$lb:${lb + es.size - 1}]=$body" else body
      parsePgArray1D(txt) == es
    }, n = 3000)
  }

  test("fuzz parseMultidim: rectangular value -> array_out text -> parse " +
      "round-trips (row-major data, dims, explicit lower bounds)") {
    val elem = Gen.frequency(1 -> Gen.const(None), 4 -> content.map(Some(_)))
    val gen = for {
      ndims <- Gen.choose(1, 3)
      dims <- Gen.listOfN(ndims, Gen.choose(1, 3))
      es <- Gen.listOfN(dims.product, elem)
      force <- Gen.choose(0, 3)
      lbs <- Gen.listOfN(ndims, Gen.choose(-3, 3))
      deco <- Gen.oneOf(true, false)
    } yield (dims, es, force, lbs, deco)
    check(Prop.forAll(gen) { case (dims, es, force, lbs, deco) =>
      def serialize(ds: List[Int], xs: Seq[Option[String]]): String = ds match {
        case d :: Nil => xs.map {
          case None => "NULL"
          case Some(s) if arrayNeedsQuote(s) || force == 0 => quoteArrayElem(s)
          case Some(s) => s
        }.mkString("{", ",", "}")
        case d :: rest =>
          val chunk = xs.size / d
          xs.grouped(chunk).map(serialize(rest, _)).mkString("{", ",", "}")
        case Nil => "{}"
      }
      val body = serialize(dims, es)
      val txt = if (deco)
        lbs.zip(dims).map { case (l, d) => s"[$l:${l + d - 1}]" }
          .mkString("", "", "=") + body
      else body
      val got = parseMultidim(txt)
      got.data == es && got.dims == dims.map(_.toLong) &&
        got.lower_bound == (if (deco) lbs else dims.map(_ => 1))
    }, n = 2500)
  }
}
