package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PostgreSQL → Spark type-conversion surface (SURVEY.md §2.3, T1–T35).
  *
  * The reference implements these as per-column conversion closures over
  * the PG binary wire format (`cli/src/postgres_cloner.rs:578-699`,
  * `cli/src/datatypes/`). This engine receives values in PG's *text*
  * form (the portable representation a JDBC/text scan delivers) and
  * converts with native Catalyst expressions wherever possible — every
  * function below returning a plain `Column` stays inside whole-stage
  * codegen; only the interval/multidim-array parsers (genuinely
  * recursive grammars) are Scala UDFs.
  *
  * Handling options mirror the reference's `SchemaSettings`
  * (`cli/src/postgres_cloner.rs:41-51`, defaults `:122-134`).
  */
object PgConversions {

  // ---------------------------------------------------------------- settings

  /** Mirror of the reference's `SchemaSettings` (postgres_cloner.rs:41-51):
    * one case class holding every user-facing handling knob with the
    * reference's defaults (postgres_cloner.rs:122-134). */
  final case class PgSettings(
      numericHandling: String = "double",    // double|decimal|float32|string
      decimalPrecision: Int = 38,
      decimalScale: Int = 18,
      enumHandling: String = "text",         // text|plain-text|int
      jsonHandling: String = "text",         // text-marked-json|text
      macaddrHandling: String = "text",      // text|byte-array|int64
      intervalHandling: String = "interval", // interval|struct
      arrayHandling: String = "plain",       // plain|dims|dims+lb
      float16Handling: String = "float32")   // float32|float16

  object PgSettings {
    // Clap-style value enums with the reference's aliases
    // (postgres_cloner.rs:53-120): each handling's accepted spellings,
    // normalized to the canonical token the conversion layer matches on.
    private val aliases: Map[String, Map[String, String]] = Map(
      "numeric-handling" -> Map(
        "decimal" -> "decimal", "double" -> "double", "float" -> "double",
        "float64" -> "double", "float32" -> "float32", "string" -> "string"),
      "enum-handling" -> Map(
        "text" -> "text", "plain-text" -> "plain-text", "int" -> "int"),
      "json-handling" -> Map(
        "text" -> "text", "text-marked-as-json" -> "text-marked-json",
        "text-marked-json" -> "text-marked-json"),
      "macaddr-handling" -> Map(
        "text" -> "text", "byte-array" -> "byte-array", "int64" -> "int64"),
      "interval-handling" -> Map(
        "interval" -> "interval", "struct" -> "struct"),
      "array-handling" -> Map(
        "plain" -> "plain", "dimensions" -> "dims", "dims" -> "dims",
        "dimensions+lowerbound" -> "dims+lb",
        "dimensions+lower_bound" -> "dims+lb",
        "dimensions+lower-bound" -> "dims+lb", "dims+lb" -> "dims+lb"),
      "float16-handling" -> Map(
        "float32" -> "float32", "float16" -> "float16"))

    private def norm(option: String, value: String): String =
      aliases(option).getOrElse(value,
        throw new IllegalArgumentException(
          s"invalid value '$value' for --$option (expected one of: " +
            aliases(option).keys.toSeq.sorted.mkString(", ") + ")"))

    /** Validate every handling value at parse time (the reference's clap
      * ValueEnum rejects bad spellings before any connection is made;
      * without this a bogus value would only surface — or silently pass —
      * when a column of the affected type is actually exported). */
    def validated(s: PgSettings): PgSettings = s.copy(
      numericHandling = norm("numeric-handling", s.numericHandling),
      enumHandling = norm("enum-handling", s.enumHandling),
      jsonHandling = norm("json-handling", s.jsonHandling),
      macaddrHandling = norm("macaddr-handling", s.macaddrHandling),
      intervalHandling = norm("interval-handling", s.intervalHandling),
      arrayHandling = norm("array-handling", s.arrayHandling),
      float16Handling = norm("float16-handling", s.float16Handling))
  }

  // ------------------------------------------------------------ T1–T5, T11

  /** T1 bool: PG text 't'/'f' → BooleanType (postgres_cloner.rs:586). */
  def pgBool(c: Column): Column =
    when(c === "t", lit(true)).when(c === "f", lit(false))
      .otherwise(c.cast(BooleanType))

  /** T2 int2 → ShortType (postgres_cloner.rs:587). */
  def pgInt2(c: Column): Column = c.cast(ShortType)

  /** T3 int4 → IntegerType (postgres_cloner.rs:588). */
  def pgInt4(c: Column): Column = c.cast(IntegerType)

  /** T4 oid (u32): reference annotates Parquet UInt32
    * (postgres_cloner.rs:589, myfrom.rs:38-42). Spark has no unsigned
    * types → widen to LongType so all 2^32 values survive (documented
    * deviation, SURVEY §7.4). */
  def pgOid(c: Column): Column = c.cast(LongType)

  /** T5 int8 → LongType (postgres_cloner.rs:590). */
  def pgInt8(c: Column): Column = c.cast(LongType)

  /** T11 "char" (1-byte, annotated UInt8 by the reference,
    * postgres_cloner.rs:597): widen to ShortType for 128..255. */
  def pgCharByte(c: Column): Column = c.cast(ShortType)

  /** T11 from the TEXT form a JDBC scan delivers — the character itself,
    * not its code ('' is the zero byte): code point → ShortType.
    * PG 14+ prints bytes ≥ 0x80 as a 3-digit octal escape (`\310`) —
    * decoded back to the byte value, NOT ascii('\\')=92. A code point
    * above 255 means the byte was already destroyed in transit (pre-14
    * servers deliver high bytes as U+FFFD through a UTF-8 client
    * encoding) — error with the offending value (O22) rather than let
    * the ANSI Short overflow produce an opaque failure. */
  def pgCharFromText(c: Column): Column =
    when(c.isNull, lit(null).cast(ShortType)) // NULL passes through, never raises
      .when(c.rlike("^\\\\[0-7]{3}$"),
        conv(substring(c, 2, 3), 8, 10).cast(ShortType))
      // the ascii branch must also pin length ≤ 1 ('' is the zero
      // byte): ascii('ab') would silently yield the FIRST char's code,
      // passing multi-char garbage the docstring promises errors on
      .when(length(c) <= 1 && ascii(c) <= 255, ascii(c).cast(ShortType))
      .otherwise(raise_error(concat(
        lit("\"char\" text form is not a single byte: '"), c,
        lit("' (pre-PG14 high-byte transfer?) — cast to ::int2 server-side"))))

  // ----------------------------------------------------------------- T6: floats

  /** T6 float4/float8: PG text (incl 'NaN','Infinity','-Infinity','-0')
    * → Float/Double preserving specials bit-exactly
    * (postgres_cloner.rs:591-592; py-tests/test_basic_types.py:78-103). */
  def pgFloat4(c: Column): Column = c.cast(FloatType)
  def pgFloat8(c: Column): Column = c.cast(DoubleType)

  // ------------------------------------------------------------ T7–T9: numeric

  /** T7 numeric → DecimalType(p,s): NaN → NULL (parquet has no decimal
    * NaN), out-of-range → NULL (datatypes/numeric.rs:19-28;
    * py-tests/test_basic_types.py:104-147). try_cast decides overflow on
    * the EXACT decimal value after HALF_UP rounding — the r04 verdict
    * flagged the previous double-compare guard, which misjudged values
    * with >15 significant digits near the bound (and let rounding-carry
    * overflows like 99999.99996 at (9,4) reach an ANSI-throwing cast). */
  def numericToDecimal(c: Column, p: Int, s: Int): Column =
    when(c === "NaN", lit(null).cast(DecimalType(p, s)))
      .otherwise(c.try_cast(DecimalType(p, s)))

  /** T7 at precision > 38 (reference tests use 76 and 140,
    * py-tests/test_basic_types.py:126-132): exceeds Spark's DecimalType
    * maximum, so emit the same physical bytes the reference writes —
    * the two's-complement big-endian unscaled value at the requested
    * scale (datatypes/numeric.rs:12-17 `convert_decimal_to_bytes`) as
    * BinaryType (SURVEY §7.4 documented deviation: Spark cannot attach
    * the DECIMAL(p>38) logical annotation). NaN → NULL as in the
    * in-range path. */
  private[graft] def bigDecimalBytes(text: String, scale: Int): Array[Byte] =
    new java.math.BigDecimal(text)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue().toByteArray

  def numericToBigDecimalBytes(c: Column, precision: Int, scale: Int): Column = {
    // ±Infinity (legal numeric values since PG 14) and values whose
    // unscaled form exceeds the requested precision go to NULL — the
    // same decision try_cast makes for the p≤38 decimal path (T7
    // overflow policy); only NaN-like specials were filtered before,
    // so an Infinity or an over-wide value crashed the task instead
    val u = udf((s: String) =>
      Option(s).filter(v => v != "NaN" && v != "Infinity" && v != "-Infinity")
        .map(bigDecimalBytes(_, scale))
        .filter(b => new java.math.BigInteger(b).abs.toString.length <= precision))
    u(c)
  }

  /** T8 numeric → double/float32: parse from decimal text (the
    * precision-preserving path the reference uses, numeric.rs:81-98);
    * NaN stays NaN. */
  def numericToDouble(c: Column): Column = c.cast(DoubleType)
  def numericToFloat(c: Column): Column = c.cast(FloatType)

  /** T9 numeric → string: PG decimal text passthrough; NaN → literal
    * "NaN" (postgres_cloner.rs:735-739). Text input is already exactly
    * that. */
  def numericToString(c: Column): Column = c.cast(StringType)

  // ----------------------------------------------------------------- T10 money

  /** T10 money: raw int64 cents → Decimal(18,2)
    * (postgres_cloner.rs:596, datatypes/money.rs:6-26). Integer/100 at
    * scale 2 is exact — no rounding can occur. The intermediate holds
    * any Long (19 digits need (20,0), not (20,2)); values beyond the
    * (18,2) target — PG money reaches ±92,233,720,368,547,758.07 — go
    * to NULL via try_cast like the T7 numeric overflow policy, instead
    * of an ANSI overflow killing the export. */
  def moneyToDecimal(cents: Column): Column =
    (cents.cast(DecimalType(20, 0)) / lit(100)).try_cast(DecimalType(18, 2))

  /** T10 on the text transfer: `$1,234.56` / `-$0.42` (C-locale
    * lc_monetary output, what a JDBC scan delivers) → Decimal(18,2).
    * The binary wire form is raw int64 cents — that path is
    * [[moneyToDecimal]]. Currency symbol and group separators are
    * stripped; locales that swap `.`/`,` roles are out of scope
    * (documented — the reference never sees the text form at all). */
  def moneyFromText(c: Column): Column = {
    // shape-check first so ONLY the legal-but-overflowing case goes to
    // NULL (T7 overflow policy, matching moneyToDecimal) — genuinely
    // malformed text ('12.34.56', 'N/A') must still error with the
    // offending value (O22), which a bare try_cast would silently null
    val stripped = regexp_replace(c, "[^0-9.-]", "")
    when(c.isNull, lit(null).cast(DecimalType(18, 2)))
      .when(!stripped.rlike("^-?[0-9]+(\\.[0-9]+)?$"),
        raise_error(concat(lit("malformed money text: '"), c, lit("'"))))
      .otherwise(stripped.try_cast(DecimalType(18, 2)))
  }

  // ------------------------------------------------------- T12–T14: bytes/text

  /** T12 bytea: PG hex text form '\x0102' → BinaryType. */
  def pgBytea(c: Column): Column =
    unhex(regexp_replace(c, "^\\\\x", ""))

  /** T14 jsonb: the wire value carries a 1-byte version header the
    * reference strips (datatypes/jsonb.rs:17-24); here the header-bearing
    * binary → UTF-8 string. json (no header) is a passthrough. */
  def jsonbStripHeader(bin: Column): Column =
    decode(substr(bin, lit(2), length(bin) - 1), "UTF-8")

  // ------------------------------------------------------ T15–T18: date & time

  /** PG-legal temporal values no Spark temporal type can represent —
    * `infinity`/`-infinity` (common as a bitemporal `valid_to`, and
    * printed as an explicit range bound by `daterange(x,'infinity')`)
    * and BC-era text (`0001-01-01 BC`) — become NULL, the same decision
    * the T7 numeric path makes for NaN. Everything ELSE keeps the
    * ANSI-throwing cast: genuinely malformed text must error with the
    * offending value (O22), not silently null out. */
  private def temporalFromText(c: Column, target: org.apache.spark.sql.types.DataType): Column =
    when(c === "infinity" || c === "-infinity" || c.endsWith(" BC"),
      lit(null).cast(target))
      .otherwise(c.cast(target))

  /** T17 date: 'yyyy-mm-dd' → DateType (postgres_cloner.rs:612-613);
    * infinity/BC → NULL. */
  def pgDate(c: Column): Column = temporalFromText(c, DateType)

  /** T16 timestamp (no tz) → TimestampNTZType micros
    * (postgres_cloner.rs:610-611); infinity/BC → NULL. */
  def pgTimestamp(c: Column): Column = temporalFromText(c, TimestampNTZType)

  /** T15 timestamptz → TimestampType (UTC-adjusted micros,
    * postgres_cloner.rs:608-609). Sessions pin spark.sql.session.timeZone
    * =UTC so the text form is interpreted exactly like PG's UTC wire
    * form; infinity/BC → NULL. */
  def pgTimestampTz(c: Column): Column = temporalFromText(c, TimestampType)

  /** T18 time: 'HH:MM:SS[.ffffff]' → micros since midnight as Long
    * (Spark has no TimeType; SURVEY §2.3 T18 documents LongType).
    * PG's time domain includes the legal upper-bound value '24:00:00'
    * (src/include/datatype/timestamp.h allowed range), which is NOT a
    * valid timestamp hour — special-cased to 86400000000 instead of
    * letting the ANSI to_timestamp throw mid-export. */
  def pgTimeMicros(c: Column): Column =
    when(c.startsWith("24:"),
      lit(86400000000L) + unix_micros(to_timestamp(
        concat(lit("1970-01-01 00:"), substring(c, 4, 16)))))
      .otherwise(unix_micros(to_timestamp(concat(lit("1970-01-01 "), c))))

  // ----------------------------------------------------------------- T19: uuid

  /** T19 uuid: canonical text → 16-byte binary, matching the reference's
    * FIXED_LEN_BYTE_ARRAY(16) bytes (postgres_cloner.rs:617-618,
    * myfrom.rs:87-91). */
  def uuidToBinary(c: Column): Column = unhex(regexp_replace(c, "-", ""))

  // -------------------------------------------------------------- T20: macaddr

  /** T20 macaddr, 3 handlings (postgres_cloner.rs:620-628,
    * myfrom.rs:99-117): canonical dashed-hex text / 6-byte binary /
    * int64 of the 6 bytes big-endian. */
  def macaddrText(c: Column): Column =
    lower(regexp_replace(c, "[:.]", "-"))
  def macaddrBinary(c: Column): Column =
    unhex(regexp_replace(c, "[:.-]", ""))
  def macaddrInt64(c: Column): Column =
    conv(regexp_replace(c, "[:.-]", ""), 16, 10).cast(LongType)

  // ---------------------------------------------------------- T22: bit strings

  /** T22 bit/varbit: PG text form is already the '0'/'1' string the
    * reference emits (postgres_cloner.rs:631-632). */
  def pgBits(c: Column): Column = c.cast(StringType)

  // ------------------------------------------------------- T23/T24: interval

  /** Interval parts exactly as PG stores them (months, days, micros) —
    * the struct handling's field set (postgres_cloner.rs:638-653). */
  final case class PgIntervalParts(months: Int, days: Int, microseconds: Long)

  private val intervalYmd =
    """(-?\d+)\s+(year|mon|day)s?""".r
  private val intervalHms =
    """(?:^|\s)([+-]?)(\d+):(\d{2}):(\d{2})(\.\d{1,6})?""".r

  /** Parse PG's postgres-style interval text
    * ('1 year 2 mons 3 days 04:05:06.000001', negatives allowed per
    * part) into (months, days, microseconds). Text in any OTHER
    * IntervalStyle (iso_8601 'P1Y2M3DT4H5M6S', sql_standard
    * '+1-2 +3 +4:05:06') errors with the offending value — the T35/O22
    * policy the range/composite/array parsers follow — instead of
    * silently exporting zeros or a partial value; the hint names the
    * session setting that fixes it. */
  private[graft] def parseInterval(s: String): PgIntervalParts = {
    // sql_standard's year-month lead ('+1-2 +3 +4:05:06') would slip
    // through on its HMS tail alone and silently DROP the months —
    // reject the style outright rather than return a partial value
    if (s.trim.matches("""[+-]?\d+-\d+([ \t].*)?"""))
      throw new IllegalArgumentException(
        s"cannot parse interval value '$s' (sql_standard IntervalStyle " +
          "output is not supported; set IntervalStyle to 'postgres')")
    var months = 0; var days = 0; var micros = 0L
    var matched = false
    intervalYmd.findAllMatchIn(s).foreach { m =>
      matched = true
      val n = m.group(1).toLong
      m.group(2) match {
        case "year" => months += (n * 12).toInt
        case "mon"  => months += n.toInt
        case "day"  => days += n.toInt
      }
    }
    intervalHms.findFirstMatchIn(s).foreach { m =>
      matched = true
      val sign = if (m.group(1) == "-") -1L else 1L
      val frac = Option(m.group(5))
        .map(f => (f.drop(1).padTo(6, '0')).toLong).getOrElse(0L)
      micros = sign * ((m.group(2).toLong * 3600L +
        m.group(3).toLong * 60L + m.group(4).toLong) * 1000000L + frac)
    }
    if (!matched) throw new IllegalArgumentException(
      s"cannot parse interval value '$s' (expected postgres-style " +
        "output like '1 year 2 mons 3 days 04:05:06'; is the session's " +
        "IntervalStyle set to something other than 'postgres'?)")
    PgIntervalParts(months, days, micros)
  }

  /** T24 interval → struct{months,days,microseconds}
    * (postgres_cloner.rs:638-653; py-tests/test_basic_types.py:262-280:
    * '1 year 2 months 1 days 40:05:06.000001' → {14, 1, 144306000001}). */
  val intervalToStruct =
    udf((s: String) => Option(s).map(parseInterval))

  /** T23 interval → 12-byte LE Parquet INTERVAL bytes: µs truncated to
    * ms, whole-day seconds folded into the day field
    * (datatypes/interval.rs:27-44). */
  private[graft] def intervalBytes(p: PgIntervalParts): Array[Byte] = {
    val msPerDay = 1000L * 60 * 60 * 24
    val millisTotal = p.microseconds / 1000L
    val days = p.days + (millisTotal / msPerDay).toInt
    val millis = (millisTotal % msPerDay).toInt
    val b = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(p.months).putInt(days).putInt(millis)
    b.array()
  }

  val intervalToBytes =
    udf((s: String) => Option(s).map(x => intervalBytes(parseInterval(x))))

  // ----------------------------------------------------------------- T25/T26: enum

  /** T26 enum → int: 1-based index in catalog definition order
    * (postgres_cloner.rs:439-446). The order list is what a pg_enum
    * catalog read yields; lookup is a broadcast-safe map literal so the
    * conversion stays codegen'd. Unknown values error (ANSI element_at),
    * matching the reference's panic. T25 (text handling) is identity. */
  def enumToInt(c: Column, definitionOrder: Seq[String]): Column = {
    val m = map(definitionOrder.zipWithIndex.flatMap {
      case (v, i) => Seq(lit(v), lit(i + 1))
    }: _*)
    element_at(m, c)
  }

  // ----------------------------------------------------------------- T27: range

  /** Quote-aware split of PG record/range inner text on top-level commas
    * — the same tokenizer rules as the array grammar (parsePgArray1D)
    * applied to the record syntax (pg_custom_types.rs:162-287): fields
    * containing `,` `(` `)` `"` `\` or empty strings come quoted, with
    * `\x` escapes and doubled `""` inside quotes. An *unquoted* empty
    * token is the NULL/infinite marker; a *quoted* empty token is a real
    * empty string — the distinction the old split_part parse lost. */
  private[graft] def splitQuotedFields(inner: String): Seq[Option[String]] = {
    val out = scala.collection.mutable.ArrayBuffer[Option[String]]()
    val sb = new StringBuilder
    var i = 0; var quoted = false; var wasQuoted = false
    def flush(): Unit = {
      val t = sb.toString
      out += (if (!wasQuoted && t.isEmpty) None else Some(t))
      sb.clear(); wasQuoted = false
    }
    while (i < inner.length) {
      val ch = inner.charAt(i)
      if (quoted) ch match {
        case '\\' => sb.append(inner.charAt(i + 1)); i += 1
        case '"' =>
          if (i + 1 < inner.length && inner.charAt(i + 1) == '"') {
            sb.append('"'); i += 1 // doubled quote inside quotes
          } else quoted = false
        case c => sb.append(c)
      } else ch match {
        case '"' => quoted = true; wasQuoted = true
        case '\\' => sb.append(inner.charAt(i + 1)); i += 1
        case ',' => flush()
        case c => sb.append(c)
      }
      i += 1
    }
    require(!quoted, "unterminated quote")
    flush()
    out.toSeq
  }

  /** Parsed range text (fields named to match the output struct). */
  final case class PgRangeParts(
      lower: Option[String], upper: Option[String],
      lower_inclusive: Boolean, upper_inclusive: Boolean, is_empty: Boolean)

  private[graft] def parseRange(s: String): PgRangeParts = try {
    if (s == "empty") PgRangeParts(None, None, lower_inclusive = false,
      upper_inclusive = false, is_empty = true)
    else {
      require(s.length >= 3 && "[(".contains(s.head) && "])".contains(s.last),
        "missing range brackets")
      val bounds = splitQuotedFields(s.substring(1, s.length - 1))
      require(bounds.length == 2, s"expected 2 bounds, got ${bounds.length}")
      PgRangeParts(bounds(0), bounds(1),
        lower_inclusive = s.head == '[', upper_inclusive = s.last == ']',
        is_empty = false)
    }
  } catch { // T35/O22 policy: label the failing value
    case e: Exception => throw new IllegalArgumentException(
      s"malformed PG range text '$s': ${e.getMessage}", e)
  }

  private lazy val rangeParseUdf = udf((s: String) => Option(s).map(parseRange))

  /** T27 range → struct{lower,upper,lower_inclusive,upper_inclusive,
    * is_empty} from PG's canonical text form
    * (postgres_cloner.rs:501-540, pg_custom_types.rs:84-161):
    * 'empty' → all-NULL bounds + is_empty=true + inclusivities false;
    * infinite bounds ('(,)') → NULL bound, is_empty=false. Bounds are
    * tokenized quote-aware (quoted timestamps, text bounds with embedded
    * commas/quotes) and arrive at `castElem` already unquoted/unescaped.
    * `castElem` maps the bound text to the subtype (int, timestamp, …). */
  def rangeToStruct(c: Column, castElem: Column => Column): Column = {
    val p = rangeParseUdf(c)
    def bound(name: String) = {
      val b = p.getField(name)
      when(b.isNull, lit(null)).otherwise(castElem(b)).as(name)
    }
    when(c.isNull, lit(null)).otherwise(struct(
      bound("lower"),
      bound("upper"),
      p.getField("lower_inclusive").as("lower_inclusive"),
      p.getField("upper_inclusive").as("upper_inclusive"),
      p.getField("is_empty").as("is_empty")))
  }

  // ------------------------------------------------------------ T28: composite

  private[graft] def parseComposite(s: String): Seq[Option[String]] = try {
    require(s.length >= 2 && s.head == '(' && s.last == ')', "missing parens")
    splitQuotedFields(s.substring(1, s.length - 1))
  } catch { // T35/O22 policy: label the failing value
    case e: Exception => throw new IllegalArgumentException(
      s"malformed PG record text '$s': ${e.getMessage}", e)
  }

  private lazy val recordParseUdf =
    udf((s: String) => Option(s).map(parseComposite))

  /** T28 composite → struct: parse PG record text '(a,b,c)' into named
    * fields (postgres_cloner.rs:541-558, pg_custom_types.rs:162-287).
    * Unquoted empty field text → NULL field; all-NULL-fields record
    * '(,,)' is a non-NULL struct, distinct from SQL NULL
    * (py-tests/test_custom_types.py:146-147). Fields are tokenized
    * quote-aware: embedded commas/quotes/escapes and the quoted empty
    * string '""' ≠ NULL all round-trip (test_custom_types.py:135-160). */
  def compositeToStruct(c: Column, fields: Seq[(String, Column => Column)]): Column = {
    val arr = recordParseUdf(c)
    val cols = fields.zipWithIndex.map { case ((name, cast), i) =>
      val f = element_at(arr, i + 1)
      when(f.isNull, lit(null)).otherwise(cast(f)).as(name)
    }
    when(c.isNull, lit(null)).otherwise(struct(cols: _*))
  }

  // ------------------------------------------------- T30/T31: arrays

  /** T30 1-D array: PG text '{a,b,NULL}' → ArrayType with element
    * nulls; '{}' → empty array ≠ NULL (appenders/array.rs:98-115).
    * Elements with NaN (numeric arrays) go through the same NaN→NULL
    * rule as scalars when castElem = numericToDecimal. */
  /** 1-D PG array text grammar, quote-aware: quoted elements may carry
    * embedded commas/braces (range arrays: '{"[1,3)","(,)"}'), backslash
    * escapes ('{"a\"b"}'), and quoting disambiguates the *string* "NULL"
    * from a SQL NULL element (PG always quotes the former). A genuine
    * recursive token grammar → small UDF, same call the reference makes
    * for its array parse (SURVEY §2.3 T30/T31). */
  private[graft] def parsePgArray1D(s: String): Seq[Option[String]] = try {
    // strip the explicit-bounds decoration PG emits for non-default
    // lower bounds ('[0:2]={10,20,30}'); plain handling discards the
    // bounds by design (dims mode keeps them via parseMultidim)
    val body = if (s.startsWith("[")) s.substring(s.indexOf('=') + 1) else s
    require(body.startsWith("{") && body.endsWith("}"), "missing braces")
    // a multidim VALUE in a plain-handled column ('{{1,2},{3,4}}' —
    // int[] and int[][] share one pg type oid, so any row may nest):
    // flatten to the row-major element list, which is exactly what the
    // reference's Plain mode writes (the wire element stream, dims
    // dropped). An unquoted '{' right after the opening brace can only
    // mean nesting — PG quotes scalar elements containing braces.
    if (body.length > 1 && body.charAt(1) == '{')
      return parseMultidim(s).data
    val inner = body.substring(1, body.length - 1)
    if (inner.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Option[String]]()
    val sb = new StringBuilder
    var i = 0; var quoted = false; var wasQuoted = false
    def flush(): Unit = {
      val t = sb.toString
      out += (if (!wasQuoted && t == "NULL") None else Some(t))
      sb.clear(); wasQuoted = false
    }
    while (i < inner.length) {
      val ch = inner.charAt(i)
      if (quoted) {
        if (ch == '\\') { sb.append(inner.charAt(i + 1)); i += 1 }
        else if (ch == '"') quoted = false
        else sb.append(ch)
      } else ch match {
        case '"' => quoted = true; wasQuoted = true
        case ',' => flush()
        case c => sb.append(c)
      }
      i += 1
    }
    require(!quoted, "unterminated quote")
    flush()
    out.toSeq
  } catch { // T35/O22 policy: label the failing value, don't leak an OOB
    case e: Exception => throw new IllegalArgumentException(
      s"malformed PG array text '$s': ${e.getMessage}", e)
  }

  private lazy val pgArray1dUdf =
    udf((s: String) => if (s == null) null else parsePgArray1D(s))

  def arrayFromText(c: Column, castElem: Column => Column): Column =
    when(c.isNull, lit(null))
      .otherwise(transform(pgArray1dUdf(c), e =>
        when(e.isNull, lit(null)).otherwise(castElem(e))))

  /** Multidim parse result for T31 (postgres_cloner.rs:843-893,
    * datatypes/array.rs:9-62): row-major flattened data + per-dimension
    * sizes + per-dimension lower bounds (PG default lower bound is 1;
    * explicit '[-2:0]=' prefixes override, py-tests/test_arrays.py:104). */
  final case class PgMultidimArray(
      data: Seq[Option[String]], dims: Seq[Long], lower_bound: Seq[Int])

  /** T31 multi-dim array text parse: '{{1,2},{3,4}}' or
    * '[-2:0]={1,2,3}'. A genuine recursive grammar → small UDF
    * (SURVEY §2.3 T31 explicitly allows the UDF parse). Elements come
    * back as strings (quote-aware, like the 1-D grammar) so the typed
    * cast composes per subtype in [[multidimToStructOf]]. */
  private[graft] def parseMultidim(s: String): PgMultidimArray = try {
    val (boundsPart, dataPart) =
      if (s.startsWith("[")) { val i = s.indexOf('='); (s.substring(0, i), s.substring(i + 1)) }
      else ("", s)
    val explicitLb = """\[(-?\d+):(-?\d+)\]""".r
      .findAllMatchIn(boundsPart).map(_.group(1).toInt).toList

    // recursive descent over {...} nesting; quoted tokens may carry
    // commas/braces/escapes, and quoting keeps "NULL" ≠ SQL NULL
    def parse(in: String, pos: Int): (Seq[Any], Int) = {
      var i = pos + 1 // skip '{'
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      val sb = new StringBuilder
      var wasQuoted = false
      def flush(): Unit = {
        val t = sb.result(); sb.clear()
        if (t.nonEmpty || wasQuoted)
          out += (if (!wasQuoted && t == "NULL") None else Some(t))
        wasQuoted = false
      }
      while (i < in.length && in.charAt(i) != '}') {
        in.charAt(i) match {
          case '{' => val (sub, ni) = parse(in, i); out += sub; i = ni
          case ',' => flush(); i += 1
          case '"' =>
            wasQuoted = true; i += 1
            while (in.charAt(i) != '"') {
              if (in.charAt(i) == '\\') { sb += in.charAt(i + 1); i += 2 }
              else { sb += in.charAt(i); i += 1 }
            }
            i += 1
          case ch  => sb += ch; i += 1
        }
      }
      flush()
      (out.toSeq, i + 1)
    }
    val (tree, _) = parse(dataPart, 0)

    def dimsOf(t: Seq[Any]): List[Long] = t.headOption match {
      case Some(sub: Seq[_]) => t.size.toLong :: dimsOf(sub.asInstanceOf[Seq[Any]])
      case _                 => if (t.isEmpty) Nil else List(t.size.toLong)
    }
    def flat(t: Seq[Any]): Seq[Option[String]] = t.flatMap {
      case sub: Seq[_] => flat(sub.asInstanceOf[Seq[Any]])
      case v: Option[_] => Seq(v.asInstanceOf[Option[String]])
    }
    val dims = dimsOf(tree)
    val lb = if (explicitLb.nonEmpty) explicitLb else dims.map(_ => 1)
    PgMultidimArray(flat(tree), dims, lb)
  } catch { // T35/O22 policy: label the failing value, don't leak an OOB
    case e: Exception => throw new IllegalArgumentException(
      s"malformed PG array text '$s': ${e.getMessage}", e)
  }

  private lazy val multidimParseUdf =
    udf((s: String) => Option(s).map(parseMultidim))

  /** T31 with a typed element cast: {data: array⟨castElem(T)⟩, dims,
    * lower_bound}. The parse is subtype-agnostic; the cast composes
    * per element like the 1-D path (so multidim works for ANY scalar
    * subtype the recipe can convert, matching the reference's generic
    * multidim appender). */
  def multidimToStructOf(c: Column, castElem: Column => Column): Column = {
    val p = multidimParseUdf(c)
    when(c.isNull, lit(null)).otherwise(struct(
      transform(p.getField("data"),
        e => when(e.isNull, lit(null)).otherwise(castElem(e))).as("data"),
      p.getField("dims").as("dims"),
      p.getField("lower_bound").as("lower_bound")))
  }

  /** Int64-data multidim (the common numeric case; t15). */
  def multidimToStruct(c: Column): Column =
    multidimToStructOf(c, _.cast(LongType))

  /** The reference's Dimensions mode — {data, dims} WITHOUT lower_bound
    * (postgres_cloner.rs:103-109 `SchemaSettingsArrayHandling::
    * Dimensions` vs `DimensionsAndLowerBound`). dropFields keeps NULL
    * inputs NULL, so the null semantics stay those of the full builder. */
  def multidimToStructOfDims(c: Column, castElem: Column => Column): Column =
    multidimToStructOf(c, castElem).dropFields("lower_bound")

  // ------------------------------------------------- T32–T34: pgvector

  /** T32 vector: '[1,2,3]' → ArrayType(FloatType) with non-null
    * elements (postgres_cloner.rs:659, datatypes/pgvector.rs:11-34). */
  def vectorFromText(c: Column): Column =
    transform(
      split(regexp_replace(c, "^\\[|\\]$", ""), ","),
      e => e.cast(FloatType))

  /** IEEE 754 half-precision bit pattern of a float (round to nearest
    * even, overflow → ±inf). Java 17 has no Float.floatToFloat16
    * (added in 19), so the bit algorithm is spelled out. Also feeds
    * [[graft.sources.ParquetTranscode]]'s FLBA(2) storage mode. */
  private[graft] def f16Bits(f: Float): Int = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val absBits = bits & 0x7fffffff
    val half: Int =
      if (absBits >= 0x7f800000) sign | 0x7c00 | (if (absBits > 0x7f800000) 0x200 else 0) // inf/nan
      else if (absBits >= 0x477ff000) sign | 0x7c00 // overflows f16 → inf
      else if (absBits < 0x33000000) sign // underflow → ±0
      else if (absBits < 0x38800000) { // subnormal f16
        // target integer is round(|v| / 2^-24) = mant × 2^(E-126),
        // i.e. mant >>> (126 - E) — an extra +1 on the shift halves
        // every subnormal output (caught r07; fixtures only sampled
        // 2^-24 itself, where the rounding masks the bug)
        val shift = 126 - (absBits >>> 23)
        val mant = (absBits & 0x7fffff) | 0x800000
        val m = mant >>> shift
        val rem = mant & ((1 << shift) - 1)
        val mid = 1 << (shift - 1)
        sign | (if (rem > mid || (rem == mid && (m & 1) == 1)) m + 1 else m)
      } else {
        val exp = ((absBits >>> 23) - 112) << 10
        val m = (absBits >>> 13) & 0x3ff
        val rem = absBits & 0x1fff
        val base = sign | exp | m
        if (rem > 0x1000 || (rem == 0x1000 && (m & 1) == 1)) base + 1 else base
      }
    half
  }

  /** Half-precision round-trip: float → f16 bits → float. */
  private[graft] def roundToFloat16(f: Float): Float = {
    val half = f16Bits(f)
    // back to float32
    val s = (half & 0x8000) << 16
    val e = (half >>> 10) & 0x1f
    val m = half & 0x3ff
    if (e == 0x1f) java.lang.Float.intBitsToFloat(s | 0x7f800000 | (m << 13))
    else if (e == 0) {
      if (m == 0) java.lang.Float.intBitsToFloat(s)
      else java.lang.Float.intBitsToFloat(s) + (m * math.pow(2, -24).toFloat *
        (if ((half & 0x8000) != 0) -1 else 1))
    } else java.lang.Float.intBitsToFloat(s | ((e + 112) << 23) | (m << 13))
  }

  private val f16Udf = udf((f: java.lang.Float) =>
    Option(f).map(x => roundToFloat16(x.floatValue)))

  /** T33 halfvec: float32 handling (default): values pass through f16
    * precision (postgres_cloner.rs:660-666; py-tests/test_pgvector.py:
    * 100-125 expects 1.0001→1.0, 10001→10000). */
  def halfvecFromText(c: Column): Column =
    transform(
      split(regexp_replace(c, "^\\[|\\]$", ""), ","),
      e => f16Udf(e.cast(FloatType)))

  /** T34 sparsevec: '{1:-1.5,5:5.25}/10' → Map[Int,Float]. The text
    * form's indices are already 1-based — the same +1 shift the
    * reference applies to the 0-based wire indices
    * (postgres_cloner.rs:667-693, shift at :670). '{}/n' → empty map
    * ≠ NULL. */
  def sparsevecFromText(c: Column): Column = {
    val entries = regexp_extract(c, "\\{(.*)\\}", 1)
    val emptyMap = map_from_arrays(
      array().cast(ArrayType(IntegerType)), array().cast(ArrayType(FloatType)))
    when(c.isNull, lit(null))
      // shape check FIRST: regexp_extract's no-match result is also ''
      // — without it any brace-less garbage would silently export as an
      // empty map instead of erroring with the value (T35/O22 policy)
      .when(!c.rlike("^\\{.*\\}/[0-9]+$"), raise_error(concat(
        lit("malformed sparsevec text: '"), c,
        lit("' (expected '{i:v,...}/dims')"))))
      .when(entries === "", emptyMap)
      .otherwise(
        transform_values(
          transform_keys(
            str_to_map(entries, lit(","), lit(":")),
            (k, _) => k.cast(IntegerType)),
          (_, v) => v.cast(FloatType)))
  }
}
