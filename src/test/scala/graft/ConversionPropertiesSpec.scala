package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.PgConversions._

/** Property-based checks over the pure conversion functions
  * (scalacheck driven through its own runner). */
class ConversionPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  test("f16 rounding is idempotent and sign-preserving") {
    check(Prop.forAll(Gen.chooseNum(-65504f, 65504f)) { f =>
      val once = roundToFloat16(f)
      val idem = roundToFloat16(once) == once || once.isNaN
      val sign = f == 0f || once.isNaN || once == 0f || ((f < 0) == (once < 0))
      idem && sign
    })
  }

  test("f16 bit pattern is stable under rounding (FLBA(2) storage invariant)") {
    // ParquetTranscode stores f16Bits of values already rounded through
    // roundToFloat16 — the bits must be identical to hashing the raw
    // float, or the float32 and float16 storage modes would disagree
    check(Prop.forAll(Gen.chooseNum(-70000f, 70000f)) { f =>
      f16Bits(roundToFloat16(f)) == f16Bits(f)
    })
  }

  test("f16 rounding error is within half an f16 ULP for normal values") {
    check(Prop.forAll(Gen.chooseNum(6.2e-5f, 65000f)) { f =>
      val r = roundToFloat16(f)
      val ulp = math.pow(2, math.floor(math.log(f) / math.log(2)) - 10)
      math.abs(r - f) <= ulp / 2 * 1.0000001
    })
  }

  test("interval parse: months/days/time compose linearly") {
    val g = for {
      y <- Gen.chooseNum(0, 40); m <- Gen.chooseNum(0, 11)
      d <- Gen.chooseNum(-30, 30)
      h <- Gen.chooseNum(0, 100); mi <- Gen.chooseNum(0, 59); se <- Gen.chooseNum(0, 59)
    } yield (y, m, d, h, mi, se)
    check(Prop.forAll(g) { case (y, m, d, h, mi, se) =>
      val p = parseInterval(f"$y year $m mons $d days $h%d:$mi%02d:$se%02d")
      p.months == y * 12 + m && p.days == d &&
        p.microseconds == (h * 3600L + mi * 60L + se) * 1000000L
    })
  }

  test("interval bytes: seconds fold into days; millis field stays sub-day") {
    check(Prop.forAll(Gen.chooseNum(0L, 400L * 24 * 3600 * 1000000L)) { us =>
      val b = intervalBytes(PgIntervalParts(0, 0, us))
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.getInt // months
      val days = buf.getInt
      val millis = buf.getInt
      millis >= 0 && millis < 86400000 &&
        days.toLong * 86400000L + millis == us / 1000
    })
    // NEGATIVE microseconds (parseInterval produces them: '-1 days
    // +02:03:04', '-00:00:01.5'): both Java and the reference's Rust
    // truncate toward zero, so the millis i32 slot carries the NEGATIVE
    // two's-complement value — bit-identical to what the reference
    // writes (datatypes/interval.rs:36-41), even though parquet's
    // INTERVAL annotation formally calls the fields unsigned. Pin the
    // parity so a sign-handling change can't slip through silently.
    check(Prop.forAll(Gen.chooseNum(-400L * 24 * 3600 * 1000000L, -1L)) { us =>
      val b = intervalBytes(PgIntervalParts(0, 0, us))
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.getInt // months
      val days = buf.getInt
      val millis = buf.getInt
      // reference formula: days += millisTotal / msPerDay (toward-zero),
      // millis = millisTotal % msPerDay (sign follows the dividend)
      millis <= 0 && millis > -86400000 &&
        days.toLong * 86400000L + millis == us / 1000
    })
  }

  test("multidim parse: dims recover shape, data flattens row-major") {
    val g = for {
      d1 <- Gen.chooseNum(1, 5); d2 <- Gen.chooseNum(1, 5)
      vals <- Gen.listOfN(d1 * d2, Gen.chooseNum(-1000L, 1000L))
    } yield (d1, d2, vals)
    check(Prop.forAll(g) { case (d1, d2, vals) =>
      val text = vals.grouped(d2).map(_.mkString("{", ",", "}"))
        .mkString("{", ",", "}")
      val r = parseMultidim(text)
      r.dims == Seq(d1.toLong, d2.toLong) &&
        r.data == vals.map(v => Some(v.toString)) && r.lower_bound == Seq(1, 1)
    })
  }

  test("array grammar: quoting round-trips arbitrary element strings") {
    // render a PG array text form the way the server would (quote every
    // element, escape backslash and quote), parse it back, expect the
    // original elements — including commas, braces, quotes, and the
    // literal string "NULL" (which quoting keeps distinct from SQL NULL)
    val elemG = Gen.oneOf(
      Gen.listOfN(4, Gen.asciiPrintableChar).map(_.mkString),
      Gen.oneOf("NULL", "a,b", "{x}", "\"q\"", "back\\slash", ""))
    check(Prop.forAll(Gen.listOf(elemG)) { elems =>
      val text = elems
        .map(e => "\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("{", ",", "}")
      parsePgArray1D(text) == elems.map(Some(_))
    })
  }

  test("array grammar: unquoted NULL is SQL null, quoted \"NULL\" is the string") {
    assert(parsePgArray1D("{NULL,\"NULL\",x}") == Seq(None, Some("NULL"), Some("x")))
    assert(parsePgArray1D("{}") == Seq.empty)
    assert(parsePgArray1D("{\"\"}") == Seq(Some("")))
  }

  test("array grammar: plain handling flattens a multidim VALUE row-major") {
    // int[] and int[][] share one pg type oid, so a plain-handled
    // column can hold nested values — flattened like the reference's
    // Plain mode (wire element stream, dims dropped), never tokenized
    // into brace garbage
    assert(parsePgArray1D("{{1,2},{3,4}}") ==
      Seq(Some("1"), Some("2"), Some("3"), Some("4")))
    assert(parsePgArray1D("{{a,\"b}\"},{NULL,d}}") ==
      Seq(Some("a"), Some("b}"), None, Some("d")))
    // a QUOTED scalar starting with '{' is not nesting
    assert(parsePgArray1D("{\"{x}\",y}") == Seq(Some("{x}"), Some("y")))
  }

  test("pgTimeMicros: PG's legal 24:00:00 upper bound converts, not crashes") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("24:00:00", "23:59:59.999999", "00:00:00", "16:05:06.5")
      .toDF("t")
      .select(graft.functions.PgConversions.pgTimeMicros(col("t")).as("us"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(86400000000L, 86399999999L, 0L, 57906500000L))
  }

  test("array grammar: explicit 1-D bounds prefix; malformed input is labeled") {
    // PG decorates non-default lower bounds: plain handling parses the
    // data and discards the bounds (dims mode keeps them)
    assert(parsePgArray1D("[0:2]={10,20,30}") == Seq(Some("10"), Some("20"), Some("30")))
    val unterminated = intercept[IllegalArgumentException](parsePgArray1D("{\"abc}"))
    assert(unterminated.getMessage.contains("malformed PG array text"))
    val empty = intercept[IllegalArgumentException](parsePgArray1D(""))
    assert(empty.getMessage.contains("malformed PG array text"))
    val multi = intercept[IllegalArgumentException](parseMultidim("{\"abc"))
    assert(multi.getMessage.contains("malformed PG array text"))
  }

  test("record grammar: quoting round-trips arbitrary composite fields") {
    // render a PG record text the way the server would: NULL fields are
    // empty, non-NULL fields are quoted (always-quoting is valid PG
    // form) with backslash escapes; parse must recover the fields —
    // including commas, parens, quotes, empty strings, and "NULL"
    val fieldG = Gen.option(Gen.oneOf(
      Gen.listOfN(4, Gen.asciiPrintableChar).map(_.mkString),
      Gen.oneOf("NULL", "a,b", "(x)", "\"q\"", "back\\slash", "")))
    check(Prop.forAll(Gen.nonEmptyListOf(fieldG)) { fields =>
      val text = fields
        .map {
          case None => ""
          case Some(e) =>
            "\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        }
        .mkString("(", ",", ")")
      parseComposite(text) == fields
    })
  }

  test("record grammar: doubled-quote escape is equivalent to backslash") {
    check(Prop.forAll(Gen.listOfN(3, Gen.asciiPrintableChar).map(_.mkString)) { s =>
      val doubled = "(\"" + s.replace("\\", "\\\\").replace("\"", "\"\"") + "\")"
      parseComposite(doubled) == Seq(Some(s))
    })
  }

  test("range grammar: quoted bounds round-trip; flags follow brackets") {
    val boundG = Gen.option(Gen.oneOf(
      Gen.listOfN(4, Gen.asciiPrintableChar).map(_.mkString),
      Gen.oneOf("a,b", "[x]", "\"q\"", "2020-01-01 00:00:00", "")))
    val g = for {
      lo <- boundG; hi <- boundG
      loInc <- Gen.oneOf(true, false); hiInc <- Gen.oneOf(true, false)
    } yield (lo, hi, loInc, hiInc)
    check(Prop.forAll(g) { case (lo, hi, loInc, hiInc) =>
      def render(b: Option[String]) = b.fold("")(e =>
        "\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      val text = (if (loInc) "[" else "(") + render(lo) + "," + render(hi) +
        (if (hiInc) "]" else ")")
      parseRange(text) == PgRangeParts(lo, hi, loInc, hiInc, is_empty = false)
    })
  }

  test("parseQualifiedName: quoted identifiers round-trip, unquoted fold") {
    import graft.sources.PgSchema.parseQualifiedName
    // any relname (incl. dots, quotes, mixed case) survives PG-style
    // quoting; an unquoted spelling folds to lowercase
    val ident = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('.', '"', ' ', '_'))).map(_.mkString)
    def q(s: String) = "\"" + s.replace("\"", "\"\"") + "\""
    check(Prop.forAll(ident, ident) { (schema, rel) =>
      parseQualifiedName(q(schema) + "." + q(rel)) == (Some(schema), rel) &&
        parseQualifiedName(q(rel)) == (None, rel)
    })
    check(Prop.forAll(Gen.alphaStr.suchThat(_.nonEmpty)) { s =>
      parseQualifiedName(s) == (None, s.toLowerCase)
    })
  }

  test("money text parse: C-locale formatting round-trips to exact cents") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // format cents the way PG's money_out does (C locale): $ sign,
    // thousands separators, 2 decimals, '-' prefix for negatives.
    // Deterministic edge values + a SEEDED spread — the previous
    // Gen.sample.get drew 40 unseeded values per run (irreproducible
    // failures, and .get throws on a retry-exhausted None)
    val rnd = new scala.util.Random(7)
    val cents = Seq(0L, -1L, 99L, -99L, 100L, 123456789L, -1000000000L) ++
      Seq.fill(40)(rnd.nextLong() % 1000000000L)
    def fmt(c: Long): String = {
      // manual grouping — locale-free (a %,d format would emit the JVM
      // default locale's separators and digit glyphs)
      val sign = if (c < 0) "-" else ""
      val abs = math.abs(c)
      val whole = (abs / 100).toString.reverse.grouped(3).mkString(",").reverse
      val frac = (abs % 100).toString.reverse.padTo(2, '0').reverse
      s"$sign$$$whole.$frac"
    }
    val out = cents.map(c => (c, fmt(c))).toDF("cents", "txt")
      .select(col("cents"), moneyFromText(col("txt")).as("parsed"))
      .collect()
    out.foreach { r =>
      val expected = new java.math.BigDecimal(r.getLong(0)).movePointLeft(2)
        .setScale(2)
      assert(r.getDecimal(1).compareTo(expected) == 0,
        s"cents=${r.getLong(0)} parsed=${r.getDecimal(1)}")
    }
  }

  test("bigDecimalBytes round-trips through BigInteger at the same scale") {
    val g = for {
      unscaled <- Gen.chooseNum(-1000000000L, 1000000000L)
      scale <- Gen.chooseNum(0, 30)
    } yield (unscaled, scale)
    check(Prop.forAll(g) { case (unscaled, scale) =>
      val text = new java.math.BigDecimal(
        java.math.BigInteger.valueOf(unscaled), scale).toPlainString
      new java.math.BigInteger(bigDecimalBytes(text, scale)).longValueExact == unscaled
    })
  }
}
