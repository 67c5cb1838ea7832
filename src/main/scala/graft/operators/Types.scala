package graft.operators

import graft.QueryDef
import graft.QueryDef.{canonArray, canonMap}
import graft.functions.PgConversions._
import graft.functions.PgTypeMapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.3 type-conversion fixture queries (T1–T35).
  *
  * Each query feeds the PG *text-form* values the reference's py-tests
  * insert (FIXTURES.md F1–F20) through [[graft.functions.PgConversions]]
  * and emits the converted columns. The DuckDB oracle either recomputes
  * the conversion in SQL or — where DuckDB cannot express it — asserts
  * the literal expected values taken from the reference's spec
  * (`/root/reference/py-tests`), which is exactly how the reference
  * tests itself (expected-value assertions, wrappers.py:123-129).
  *
  * Inputs are literal DataFrames: the conversions are per-column scalar
  * maps, so correctness is data-size-independent; scale behavior is
  * covered by the relational/pipeline suites.
  */
object Types {

  private def df(s: SparkSession)(rows: Seq[(Int, String)]): DataFrame = {
    import s.implicits._
    rows.toDF("id", "v")
  }

  // ---- Nested builders ------------------------------------------------
  // The REAL converted shapes — DecimalType / StructType / ArrayType /
  // MapType columns. The registered queries flatten these to the scalar
  // encodings the driver's comparator can hash (see QueryDef.canonArray
  // scaladoc for why); TypesFixtureSpec asserts the nested schemas and
  // values here directly and round-trips them through the parquet sink.

  private[graft] def t03Nested(s: SparkSession): DataFrame =
    df(s)(Seq(
      (1, "1000.0001"), (2, "NaN"),
      (3, "1.00000000000000000000000000000000000000000001"),
      (4, "99999999999.9999"), (5, null), (6, "-12345.6789"),
      // boundary rows for the EXACT overflow decision (r04 verdict #4):
      // 18 significant digits just under the (18,9) bound — a double
      // compare rounds it to 1e9 and wrongly NULLs it — and a
      // rounding-carry overflow: 99999.99996 → 100000.0000 at (9,4)
      (7, "999999999.999999999"), (8, "99999.99996")))
      .select(col("id"),
        numericToDecimal(col("v"), 38, 18).as("d38"),
        numericToDecimal(col("v"), 18, 9).as("d18"),
        numericToDecimal(col("v"), 9, 4).as("d9"))

  private[graft] def t08Nested(s: SparkSession): DataFrame =
    df(s)(Seq(
      (1, "1 year 2 mons 1 days 40:05:06.000001"),
      (2, "-1 days +02:03:04"), (3, "3 mons"), (4, null)))
      .select(col("id"), intervalToStruct(col("v")).as("interval_v"))

  private[graft] def t11Nested(s: SparkSession): DataFrame =
    df(s)(Seq(
      (1, "[1,5)"), (2, "empty"), (3, "(,)"), (4, "[3,)"), (5, "(,10)"),
      (6, null)))
      .select(col("id"),
        rangeToStruct(col("v"), _.cast(IntegerType)).as("range_v"))

  private[graft] def t12Nested(s: SparkSession): DataFrame =
    df(s)(Seq(
      (1, "[\"2020-01-01 00:00:00\",\"2020-06-30 12:00:00\")"),
      (2, "empty"), (3, "(,\"2021-01-01 00:00:00\")"), (4, null)))
      .select(col("id"),
        rangeToStruct(col("v"), _.cast(TimestampNTZType)).as("range_v"))

  private[graft] def t13Nested(s: SparkSession): DataFrame =
    df(s)(Seq((1, "(1ehz,1,A)"), (2, null), (3, "(,,)"), (4, "(abcd,42,Z)"),
      // quote-aware record grammar (test_custom_types.py:135-160):
      // embedded comma, doubled-quote escape, backslash escape, and the
      // quoted empty string '""' which is a real '' ≠ NULL field
      (5, "(\"a,b\",7,\"q\"\"x\")"), (6, "(\"\",8,)"),
      (7, "(\"c\\\\d\",-1,\"(e)\")")))
      .select(col("id"),
        compositeToStruct(col("v"), Seq(
          "pdbid" -> identity,
          "model" -> (_.cast(IntegerType)),
          "chain" -> identity)).as("comp_v"))

  private[graft] def t14Nested(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1, "{a,b}", "{1,2}", "{1.10,2.20}"),
      (2, null, null, null),
      (3, "{NULL,a,NULL,b}", "{}", "{NULL}"),
      (4, "{}", "{-5,NULL}", "{NaN,3.5}"))
      .toDF("id", "ta", "ia", "na")
      .select(col("id"),
        arrayFromText(col("ta"), identity).as("text_arr"),
        arrayFromText(col("ia"), _.cast(IntegerType)).as("int_arr"),
        arrayFromText(col("na"), numericToDecimal(_, 18, 9)).as("num_arr"))
  }

  private[graft] def t15Nested(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1, "{{1,2},{3,4},{NULL,5}}", "{{a,\"x,y\"},{NULL,d}}"),
      (2, "{1,2,3}", "{a,b}"),
      (3, "[-2:0]={1,2,3}", null),
      (4, "{{{1}}}", "{}"),
      (5, null, "{\"NULL\",NULL}"),
      (6, "{}", "{x}"))
      .toDF("id", "v", "tv")
      .select(col("id"),
        multidimToStruct(col("v")).as("arr_v"),
        // text subtype through the same grammar (quoted elements,
        // "NULL"-string ≠ SQL NULL) — the generic T31 path
        multidimToStructOf(col("tv"), identity).as("tarr_v"))
  }

  private[graft] def t16Nested(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1, "[1,2,3]", "[1.0001,10001]", "10101"),
      (2, null, null, null),
      (3, "[0.5,-0.25,3.75]", "[6.0e-8,1]", "0"))
      .toDF("id", "v", "hv", "bits")
      .select(col("id"),
        vectorFromText(col("v")).as("vec_v"),
        halfvecFromText(col("hv")).as("halfvec_v"),
        pgBits(col("bits")).as("bits_v"))
  }

  private[graft] def t17Nested(s: SparkSession): DataFrame =
    df(s)(Seq(
      (1, "{1:-1,5:5.25}/5"), (2, "{}/10"), (3, null), (4, "{2:0.5}/3")))
      .select(col("id"), sparsevecFromText(col("v")).as("sparse_v"))

  private[graft] def t18Nested(s: SparkSession): DataFrame = {
    import s.implicits._
    val wrapperType = StructType(Seq(
      StructField("single", ArrayType(FloatType)),
      StructField("half", ArrayType(FloatType))))
    Seq(
      (1, "[1,2]", "[0.5,0.25]"), (2, null, null), (3, "[3.5]", "[1.0001]"))
      .toDF("id", "v1", "v2")
      .select(col("id"),
        when(col("v1").isNull, lit(null).cast(wrapperType))
          .otherwise(struct(
            vectorFromText(col("v1")).as("single"),
            halfvecFromText(col("v2")).as("half"))).as("wrapper"),
        when(col("id") === 2, lit(null).cast(ArrayType(wrapperType)))
          .when(col("id") === 3, array(
            struct(vectorFromText(col("v1")).as("single"),
              halfvecFromText(col("v2")).as("half")),
            lit(null).cast(wrapperType)))
          .otherwise(array(
            struct(vectorFromText(col("v1")).as("single"),
              halfvecFromText(col("v2")).as("half")))).as("wrappers"))
  }

  private[graft] val Weekdays = Seq("monday", "tuesday", "wednesday",
    "thursday", "friday", "saturday", "sunday")

  /** F13/F15: arrays whose elements need the quote-aware grammar —
    * ranges (embedded commas), enums, and text with commas/escapes/
    * quoted "NULL" (string) vs unquoted NULL (SQL null). */
  private[graft] def t23Nested(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1, "{\"[1,3)\",empty}", "{monday,sunday}", "{\"a,b\",\"c\\\"d\"}"),
      (2, "{\"(,3)\",NULL,\"[3,)\"}", "{NULL,friday}", "{NULL,\"NULL\",plain}"),
      (3, null, null, null),
      (4, "{}", "{}", "{}"))
      .toDF("id", "ra", "ea", "ta")
      .select(col("id"),
        arrayFromText(col("ra"),
          e => rangeToStruct(e, _.cast(IntegerType))).as("range_arr"),
        arrayFromText(col("ea"), e => enumToInt(e, Weekdays)).as("enum_arr"),
        arrayFromText(col("ta"), identity).as("text_arr"))
  }

  val queries: Seq[QueryDef] = Seq(

    // ---- t01: T1/T2/T3/T5 + T4 oid(u32→long) + T11 "char"(u8→short).
    QueryDef(
      "t01_int_types",
      (s, _) => {
        import s.implicits._
        Seq(
          (1, "t", "1", "2", "3", "4294967295", "65"),
          (2, "f", "-32768", "-2147483648", "-9223372036854775807", "0", "255"),
          (3, null, null, null, null, null, null))
          .toDF("id", "b", "i2", "i4", "i8", "oid", "c1")
          .select(col("id"),
            pgBool(col("b")).as("bool_v"),
            pgInt2(col("i2")).as("i2_v"),
            pgInt4(col("i4")).as("i4_v"),
            pgInt8(col("i8")).as("i8_v"),
            pgOid(col("oid")).as("oid_v"),
            pgCharByte(col("c1")).as("char_v"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT * FROM (VALUES
          (1, true,  CAST(1 AS SMALLINT),      2,           CAST(3 AS BIGINT),
              CAST(4294967295 AS BIGINT), CAST(65 AS SMALLINT)),
          (2, false, CAST(-32768 AS SMALLINT), -2147483648, CAST(-9223372036854775807 AS BIGINT),
              CAST(0 AS BIGINT),          CAST(255 AS SMALLINT)),
          (3, NULL, NULL, NULL, NULL, NULL, NULL)
        ) t(id, bool_v, i2_v, i4_v, i8_v, oid_v, char_v) ORDER BY id""")),

    // ---- t02: T6 float4/float8 — NaN, ±Infinity, -0 preserved
    // (py-tests/test_basic_types.py:78-103).
    QueryDef(
      "t02_float_special",
      (s, _) => {
        import s.implicits._
        Seq(
          (1, "1.5", "2.2"), (2, "NaN", "NaN"), (3, "Infinity", "Infinity"),
          (4, "-Infinity", "-Infinity"), (5, "-0", "-0"), (6, null, null))
          .toDF("id", "f4", "f8")
          .select(col("id"),
            pgFloat4(col("f4")).as("f4_v"),
            pgFloat8(col("f8")).as("f8_v"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT id, CAST(f4 AS FLOAT) AS f4_v, CAST(f8 AS DOUBLE) AS f8_v
        FROM (VALUES (1,'1.5','2.2'), (2,'NaN','NaN'), (3,'Infinity','Infinity'),
                     (4,'-Infinity','-Infinity'), (5,'-0','-0'), (6,NULL,NULL)) t(id, f4, f8)
        ORDER BY id""")),

    // ---- t03: T7 numeric→decimal at the reference's three physical
    // widths (BYTE_ARRAY p38, INT64 p18, INT32 p9); NaN→NULL,
    // overflow→NULL (py-tests/test_basic_types.py:104-147).
    QueryDef(
      "t03_numeric_decimal",
      // decimals compared as strings: pandas reads parquet decimals as
      // decimal.Decimal, DuckDB's .df() as float64 — the driver hash can
      // never match on a DecimalType column (r03 t03). Both engines
      // print full scale digits on the VARCHAR cast.
      (s, _) =>
        t03Nested(s)
          .select(col("id"),
            col("d38").cast(StringType).as("d38"),
            col("d18").cast(StringType).as("d18"),
            col("d9").cast(StringType).as("d9"))
          .orderBy(col("id")),
      Some("""
        -- TRY_CAST at one-digit-wider precision (DuckDB enforces only the
        -- storage width, not the declared precision), then an EXACT
        -- decimal bound check mirrors Spark's precision enforcement
        SELECT id,
          CAST(CASE WHEN abs(TRY_CAST(v AS DECIMAL(38,18)))
                    <= 99999999999999999999.999999999999999999
               THEN TRY_CAST(v AS DECIMAL(38,18)) END AS VARCHAR) AS d38,
          CAST(CASE WHEN abs(TRY_CAST(v AS DECIMAL(19,9))) < 1000000000.0
               THEN TRY_CAST(v AS DECIMAL(19,9)) END AS VARCHAR) AS d18,
          CAST(CASE WHEN abs(TRY_CAST(v AS DECIMAL(11,4))) < 100000.0
               THEN TRY_CAST(v AS DECIMAL(11,4)) END AS VARCHAR) AS d9
        FROM (VALUES (1,'1000.0001'), (2,'NaN'),
                     (3,'1.00000000000000000000000000000000000000000001'),
                     (4,'99999999999.9999'), (5,NULL), (6,'-12345.6789'),
                     (7,'999999999.999999999'), (8,'99999.99996')) t(id, v)
        ORDER BY id""")),

    // ---- t04: T8/T9 numeric→double/float32/string; NaN stays NaN
    // (double/float) or the literal 'NaN' (string)
    // (py-tests/test_basic_types.py:148-196).
    QueryDef(
      "t04_numeric_lossy",
      (s, _) =>
        df(s)(Seq(
          (1, "1000.0001"), (2, "NaN"),
          (3, "1.00000000000000000000000000000000000000000001"), (4, null)))
          .select(col("id"),
            numericToDouble(col("v")).as("f64_v"),
            numericToFloat(col("v")).as("f32_v"),
            numericToString(col("v")).as("str_v"))
          .orderBy(col("id")),
      Some("""
        SELECT id, CAST(v AS DOUBLE) AS f64_v, CAST(v AS FLOAT) AS f32_v, v AS str_v
        FROM (VALUES (1,'1000.0001'), (2,'NaN'),
                     (3,'1.00000000000000000000000000000000000000000001'), (4,NULL)) t(id, v)
        ORDER BY id""")),

    // ---- t05: T10 money (int64 cents → Decimal(18,2)), T19 uuid
    // (16-byte binary + text), T20 macaddr (all 3 handlings).
    QueryDef(
      "t05_money_uuid_mac",
      (s, _) => {
        import s.implicits._
        Seq(
          (1, Some(123456L), "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11", "08:00:2b:01:02:03"),
          (2, Some(-50L), "00000000-0000-0000-0000-000000000000", "ff:ff:ff:ff:ff:ff"),
          (3, None, null, null))
          .toDF("id", "cents", "u", "m")
          // binary → hex strings, decimal → string (driver-safe scalars;
          // the binary/decimal forms themselves round-trip the sink in
          // PgConversionsSpec / TypesFixtureSpec).
          .select(col("id"),
            moneyToDecimal(col("cents")).cast(StringType).as("money_v"),
            hex(uuidToBinary(col("u"))).as("uuid_hex"),
            col("u").as("uuid_text"),
            macaddrText(col("m")).as("mac_text"),
            hex(macaddrBinary(col("m"))).as("mac_hex"),
            macaddrInt64(col("m")).as("mac_int"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT id,
          CAST(CAST(cents / 100.0 AS DECIMAL(18,2)) AS VARCHAR) AS money_v,
          upper(replace(u, '-', '')) AS uuid_hex,
          u AS uuid_text,
          lower(replace(m, ':', '-')) AS mac_text,
          upper(replace(m, ':', '')) AS mac_hex,
          CAST('0x' || replace(m, ':', '') AS BIGINT) AS mac_int
        FROM (VALUES
          (1, 123456, 'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11', '08:00:2b:01:02:03'),
          (2, -50, '00000000-0000-0000-0000-000000000000', 'ff:ff:ff:ff:ff:ff'),
          (3, NULL, NULL, NULL)) t(id, cents, u, m)
        ORDER BY id""")),

    // ---- t06: T12 bytea, T13 text family (char(10) space-padded),
    // T14 json passthrough + jsonb 1-byte version-header strip,
    // T22 bit/varbit → '0'/'1' text.
    QueryDef(
      "t06_text_bytes_bits",
      (s, _) => {
        import s.implicits._
        val jsonbWire: String => Array[Byte] =
          t => (1.toByte +: t.getBytes("UTF-8").toSeq).toArray
        Seq(
          (1, "\\x0102ff", "some name", "CaseInsensitive", "char      ",
            """{"a": 1}""", jsonbWire("""{"a": 1}"""), "101000", "101"),
          (2, null, null, null, null, null, null, null, null))
          .toDF("id", "by", "nm", "ci", "ch", "js", "jb", "bits", "vbits")
          // bytea compared as hex text (binary cells are bytearrays in
          // the driver's pandas frame → unhashable → crash, r03 t06)
          .select(col("id"),
            hex(pgBytea(col("by"))).as("bytea_hex"),
            col("nm").as("name_v"), col("ci").as("citext_v"), col("ch").as("char_v"),
            col("js").as("json_v"),
            jsonbStripHeader(col("jb")).as("jsonb_v"),
            pgBits(col("bits")).as("bits_v"),
            pgBits(col("vbits")).as("varbits_v"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT * FROM (VALUES
          (1, '0102FF', 'some name', 'CaseInsensitive', 'char      ',
              '{"a": 1}', '{"a": 1}', '101000', '101'),
          (2, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)
        ) t(id, bytea_hex, name_v, citext_v, char_v, json_v, jsonb_v, bits_v, varbits_v)
        ORDER BY id""")),

    // ---- t07: T15/T16/T17/T18 date & time. timestamptz is emitted as
    // epoch-micros (tz-independent; SURVEY §7.4 documents Spark's
    // session-TZ handling), timestamp as TimestampNTZ, time as
    // micros-since-midnight Long.
    QueryDef(
      "t07_datetime",
      (s, _) => {
        import s.implicits._
        Seq(
          (1, "2000-01-01", "12:34:56.123456", "2000-01-01 12:34:56.123456", "2000-01-01 12:34:56.123456"),
          (2, "1969-12-31", "00:00:00", "1969-12-31 23:59:59", "2038-01-19 03:14:07"),
          (3, null, null, null, null))
          .toDF("id", "dt", "tm", "ts", "tstz")
          .select(col("id"),
            pgDate(col("dt")).as("date_v"),
            pgTimeMicros(col("tm")).as("time_us"),
            pgTimestamp(col("ts")).as("ts_v"),
            unix_micros(pgTimestampTz(col("tstz"))).as("tstz_us"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT id, CAST(dt AS DATE) AS date_v,
               epoch_us(CAST('1970-01-01 ' || tm AS TIMESTAMP)) AS time_us,
               CAST(ts AS TIMESTAMP) AS ts_v,
               epoch_us(CAST(tstz AS TIMESTAMP)) AS tstz_us
        FROM (VALUES
          (1, '2000-01-01', '12:34:56.123456', '2000-01-01 12:34:56.123456', '2000-01-01 12:34:56.123456'),
          (2, '1969-12-31', '00:00:00', '1969-12-31 23:59:59', '2038-01-19 03:14:07'),
          (3, NULL, NULL, NULL, NULL)) t(id, dt, tm, ts, tstz)
        ORDER BY id""")),

    // ---- t08: T24 interval→struct{months,days,microseconds} — µs kept
    // (py-tests/test_basic_types.py:262-280: '1 year 2 mons 1 days
    // 40:05:06.000001' → {14, 1, 144306000001}). Oracle = literal
    // expected values (DuckDB cannot parse PG interval text). The struct
    // is built, then flattened to scalar fields for the driver-visible
    // projection (struct cells crash the driver's comparator, r03 t08);
    // the struct itself round-trips the sink in TypesFixtureSpec.
    QueryDef(
      "t08_interval_struct",
      (s, _) =>
        t08Nested(s)
          .select(col("id"),
            col("interval_v.months").as("iv_months"),
            col("interval_v.days").as("iv_days"),
            col("interval_v.microseconds").as("iv_us"))
          .orderBy(col("id")),
      Some("""
        SELECT * FROM (VALUES
          (1, CAST(14 AS INT), CAST(1 AS INT), CAST(144306000001 AS BIGINT)),
          (2, CAST(0 AS INT), CAST(-1 AS INT), CAST(7384000000 AS BIGINT)),
          (3, CAST(3 AS INT), CAST(0 AS INT), CAST(0 AS BIGINT)),
          (4, CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT))
        ) t(id, iv_months, iv_days, iv_us) ORDER BY id""")),

    // ---- t09: T23 interval→12-byte LE Parquet INTERVAL bytes: µs→ms
    // truncation, whole-day seconds folded into days
    // (datatypes/interval.rs:27-44: 40 h → +1 day 16:05:06). Oracle =
    // literal expected bytes.
    QueryDef(
      "t09_interval_bytes",
      (s, _) =>
        df(s)(Seq(
          (1, "1 year 2 mons 1 days 40:05:06.000001"),
          (2, "-1 days +02:03:04"), (3, "3 mons"), (4, null)))
          // hex text for the driver (bytearray cells crash its sort)
          .select(col("id"), hex(intervalToBytes(col("v"))).as("interval_hex"))
          .orderBy(col("id")),
      Some("""
        SELECT * FROM (VALUES
          (1, '0E0000000200000050937303'),
          (2, '00000000FFFFFFFFC0AB7000'),
          (3, '030000000000000000000000'),
          (4, NULL)
        ) t(id, interval_hex) ORDER BY id""")),

    // ---- t10: T25 enum→text (identity) + T26 enum→int (1-based
    // pg_enum definition order; postgres_cloner.rs:439-446:
    // monday=1 … sunday=7).
    QueryDef(
      "t10_enum",
      (s, _) =>
        df(s)(Seq((1, "monday"), (2, "sunday"), (3, "wednesday"), (4, null)))
          .select(col("id"),
            col("v").as("enum_text"),
            enumToInt(col("v"), Weekdays).as("enum_int"))
          .orderBy(col("id")),
      Some("""
        SELECT id, v AS enum_text,
          CASE v WHEN 'monday' THEN 1 WHEN 'tuesday' THEN 2 WHEN 'wednesday' THEN 3
                 WHEN 'thursday' THEN 4 WHEN 'friday' THEN 5 WHEN 'saturday' THEN 6
                 WHEN 'sunday' THEN 7 END AS enum_int
        FROM (VALUES (1,'monday'), (2,'sunday'), (3,'wednesday'), (4,NULL)) t(id, v)
        ORDER BY id""")),

    // ---- t11: T27 int4range→struct. 'empty' → all-NULL bounds +
    // is_empty + false inclusivities; '(,)' → NULL bounds, is_empty
    // false (pg_custom_types.rs:126-152; test_custom_types.py:100-133).
    // Flattened to scalar fields for the driver; a NULL range yields
    // NULL in every field (including the booleans), which stays
    // distinguishable from '(,)' (false,false,false).
    QueryDef(
      "t11_range_int4",
      (s, _) =>
        t11Nested(s)
          .select(col("id"),
            col("range_v.lower").as("lo"),
            col("range_v.upper").as("hi"),
            col("range_v.lower_inclusive").as("lo_inc"),
            col("range_v.upper_inclusive").as("hi_inc"),
            col("range_v.is_empty").as("is_empty"))
          .orderBy(col("id")),
      Some("""
        SELECT * FROM (VALUES
          (1, 1, 5, true, false, false),
          (2, CAST(NULL AS INT), CAST(NULL AS INT), false, false, true),
          (3, CAST(NULL AS INT), CAST(NULL AS INT), false, false, false),
          (4, 3, CAST(NULL AS INT), true, false, false),
          (5, CAST(NULL AS INT), 10, false, false, false),
          (6, CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN))
        ) t(id, lo, hi, lo_inc, hi_inc, is_empty) ORDER BY id""")),

    // ---- t12: T27 tsrange→struct (quoted timestamp bounds).
    QueryDef(
      "t12_range_ts",
      (s, _) =>
        t12Nested(s)
          .select(col("id"),
            col("range_v.lower").as("lo"),
            col("range_v.upper").as("hi"),
            col("range_v.lower_inclusive").as("lo_inc"),
            col("range_v.upper_inclusive").as("hi_inc"),
            col("range_v.is_empty").as("is_empty"))
          .orderBy(col("id")),
      Some("""
        SELECT * FROM (VALUES
          (1, CAST('2020-01-01 00:00:00' AS TIMESTAMP), CAST('2020-06-30 12:00:00' AS TIMESTAMP), true, false, false),
          (2, CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), false, false, true),
          (3, CAST(NULL AS TIMESTAMP), CAST('2021-01-01 00:00:00' AS TIMESTAMP), false, false, false),
          (4, CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN))
        ) t(id, lo, hi, lo_inc, hi_inc, is_empty) ORDER BY id""")),

    // ---- t13: T28 composite→struct; all-NULL-fields record '(,,)' is a
    // non-NULL struct ≠ SQL NULL (py-tests/test_custom_types.py:146-147),
    // plus the quote-aware record grammar (embedded commas, doubled/
    // backslash quote escapes, '""' empty string ≠ NULL field).
    // Flattened per-field + an explicit comp_null flag: the all-NULL-
    // fields record '(,,)' must stay ≠ SQL NULL after flattening.
    QueryDef(
      "t13_composite",
      (s, _) =>
        t13Nested(s)
          .select(col("id"),
            col("comp_v.pdbid").as("pdbid"),
            col("comp_v.model").as("model"),
            col("comp_v.chain").as("chain"),
            col("comp_v").isNull.as("comp_null"))
          .orderBy(col("id")),
      Some("""
        SELECT * FROM (VALUES
          (1, '1ehz', 1, 'A', false),
          (2, CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS VARCHAR), true),
          (3, CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS VARCHAR), false),
          (4, 'abcd', 42, 'Z', false),
          (5, 'a,b', 7, 'q"x', false),
          (6, '', 8, CAST(NULL AS VARCHAR), false),
          (7, 'c\d', -1, '(e)', false)
        ) t(id, pdbid, model, chain, comp_null) ORDER BY id""")),

    // ---- t14: T30 1-D arrays from PG text — NULL array ≠ empty ≠
    // [NULL]; numeric array elements follow the scalar NaN→NULL rule
    // (appenders/array.rs:98-115; test_arrays.py:13-56). First nested
    // (ArrayType) outputs through the engine + sink.
    QueryDef(
      "t14_arrays_nulls",
      // canonical "[..]" strings for the driver: NULL ≠ "[]" ≠ "[NULL]"
      // survives the encoding; the raw ArrayType columns round-trip the
      // sink in TypesFixtureSpec.
      (s, _) =>
        t14Nested(s)
          .select(col("id"),
            canonArray(col("text_arr")).as("text_arr"),
            canonArray(col("int_arr")).as("int_arr"),
            canonArray(col("num_arr")).as("num_arr"))
          .orderBy(col("id")),
      Some("""
        SELECT * FROM (VALUES
          (1, '[a,b]', '[1,2]', '[1.100000000,2.200000000]'),
          (2, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
          (3, '[NULL,a,NULL,b]', '[]', '[NULL]'),
          (4, '[]', '[-5,NULL]', '[NULL,3.500000000]')
        ) t(id, text_arr, int_arr, num_arr) ORDER BY id""")),

    // ---- t15: T31 multidim arrays → {data,dims,lower_bound} struct:
    // row-major flatten, per-dim sizes, explicit (possibly negative)
    // lower bounds (postgres_cloner.rs:843-893; test_arrays.py:94-131).
    QueryDef(
      "t15_array_multidim",
      (s, _) =>
        t15Nested(s)
          .select(col("id"),
            canonArray(col("arr_v.data")).as("data_s"),
            canonArray(col("arr_v.dims")).as("dims_s"),
            canonArray(col("arr_v.lower_bound")).as("lb_s"),
            canonArray(col("tarr_v.data")).as("tdata_s"),
            canonArray(col("tarr_v.dims")).as("tdims_s"))
          .orderBy(col("id")),
      Some("""
        SELECT * FROM (VALUES
          (1, '[1,2,3,4,NULL,5]', '[3,2]', '[1,1]', '[a,"x,y",NULL,d]', '[2,2]'),
          (2, '[1,2,3]', '[3]', '[1]', '[a,b]', '[2]'),
          (3, '[1,2,3]', '[3]', '[-2]', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
          (4, '[1]', '[1,1,1]', '[1,1,1]', '[]', '[]'),
          (5, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '["NULL",NULL]', '[2]'),
          (6, '[]', '[]', '[]', '[x]', '[1]')
        ) t(id, data_s, dims_s, lb_s, tdata_s, tdims_s) ORDER BY id""")),

    // ---- t16: T32 vector + T33 halfvec (f16 precision edges:
    // 1.0001→1.0, 10001→10000, 6.0e-8→2^-24; test_pgvector.py:100-125)
    // + bit(5) text. Halfvec oracle = literal expected floats.
    QueryDef(
      "t16_pgvector",
      // float arrays as canonical strings (Java Float.toString
      // rendering, pinned as literals in the oracle)
      (s, _) =>
        t16Nested(s)
          .select(col("id"),
            canonArray(col("vec_v")).as("vec_s"),
            canonArray(col("halfvec_v")).as("halfvec_s"),
            col("bits_v"))
          .orderBy(col("id")),
      Some("""
        SELECT * FROM (VALUES
          (1, '[1.0,2.0,3.0]', '[1.0,10000.0]', '10101'),
          (2, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), NULL),
          (3, '[0.5,-0.25,3.75]', '[5.9604645E-8,1.0]', '0')
        ) t(id, vec_s, halfvec_s, bits_v) ORDER BY id""")),

    // ---- t17: T34 sparsevec → Map[Int,Float]; text indices already
    // carry the +1 shift the reference applies to wire indices
    // (postgres_cloner.rs:670); '{}/10' → empty map ≠ NULL
    // (test_pgvector.py:34-45). First MapType through the sink.
    QueryDef(
      "t17_sparsevec",
      // key-sorted "{k:v,…}" string: empty map "{}" stays ≠ NULL;
      // the MapType column itself round-trips in TypesFixtureSpec.
      (s, _) =>
        t17Nested(s)
          .select(col("id"), canonMap(col("sparse_v")).as("sparse_s"))
          .orderBy(col("id")),
      Some("""
        SELECT * FROM (VALUES
          (1, '{1:-1.0,5:5.25}'),
          (2, '{}'),
          (3, CAST(NULL AS VARCHAR)),
          (4, '{2:0.5}')
        ) t(id, sparse_s) ORDER BY id""")),

    // ---- t18: F20-style nesting stress — list⟨struct⟨list⟨float⟩⟩⟩ with
    // NULLs at every level, exercising Spark's Dremel shredder (O9–O15)
    // end-to-end (test_pgvector.py:128-173).
    QueryDef(
      "t18_nested_vectors",
      (s, _) => {
        // canonical string per wrapper struct; the genuinely-nested
        // list⟨struct⟨list⟨float⟩⟩⟩ column round-trips the sink in
        // TypesFixtureSpec (driver cells must stay scalar).
        def cw(w: Column): Column =
          when(w.isNull, lit(null).cast(StringType))
            .otherwise(concat(lit("{single:"),
              coalesce(canonArray(w.getField("single")), lit("NULL")),
              lit(",half:"),
              coalesce(canonArray(w.getField("half")), lit("NULL")), lit("}")))
        t18Nested(s)
          .select(col("id"),
            cw(col("wrapper")).as("wrapper_s"),
            canonArray(col("wrappers"), cw).as("wrappers_s"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT * FROM (VALUES
          (1, '{single:[1.0,2.0],half:[0.5,0.25]}', '[{single:[1.0,2.0],half:[0.5,0.25]}]'),
          (2, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
          (3, '{single:[3.5],half:[1.0]}', '[{single:[3.5],half:[1.0]},NULL]')
        ) t(id, wrapper_s, wrappers_s) ORDER BY id""")),

    // ---- t19: T7 precision beyond DecimalType's 38 (reference tests
    // use numeric(140,100) exported at p76/s50,
    // py-tests/test_basic_types.py:126-132) — the settings-driven
    // [[graft.functions.PgTypeMapper]] routes to the two's-complement
    // byte encoding the reference writes; string handling keeps full
    // 100-digit fidelity. Oracle = literal expected bytes.
    QueryDef(
      "t19_numeric_p76",
      (s, _) => {
        val p76 = PgSettings(
          numericHandling = "decimal", decimalPrecision = 76, decimalScale = 50)
        val str = PgSettings(numericHandling = "string")
        df(s)(Seq(
          (1, "1000.0001"), (2, "NaN"),
          (3, "1.00000000000000000000000000000000000000000001"),
          (4, null), (5, "-12345.6789")))
          .select(col("id"),
            hex(PgTypeMapper.convert("numeric", col("v"), p76)).as("d76_hex"),
            PgTypeMapper.convert("numeric", col("v"), str).as("str_v"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT * FROM (VALUES
          (1, '010B46C88E4142A5C5CBAE9201154CFDFA400000000000', '1000.0001'),
          (2, NULL, 'NaN'),
          (3, '446C3B15F9926687D2C40534FDB5640000000F4240',
              '1.00000000000000000000000000000000000000000001'),
          (4, NULL, NULL),
          (5, 'F31C4A5EF46CB5DDA4087AF14786B6D858C00000000000', '-12345.6789')
        ) t(id, d76_hex, str_v) ORDER BY id""")),

    // ---- t20: F16 enum ranges — a range whose subtype is an enum:
    // text bounds plus the enum→int handling applied inside the range
    // struct (test_custom_types.py:94-133; bounds '[monday,tuesday]',
    // '(,)', 'empty', NULL).
    QueryDef(
      "t20_enum_range",
      (s, _) => {
        val rt = rangeToStruct(col("v"), identity)
        val ri = rangeToStruct(col("v"), e => enumToInt(e, Weekdays))
        df(s)(Seq(
          (1, "[monday,tuesday]"), (2, "(,)"), (3, "empty"), (4, null),
          (5, "[friday,)")))
          .select(col("id"),
            rt.getField("lower").as("t_lo"),
            rt.getField("upper").as("t_hi"),
            ri.getField("lower").as("i_lo"),
            ri.getField("upper").as("i_hi"),
            rt.getField("lower_inclusive").as("lo_inc"),
            rt.getField("upper_inclusive").as("hi_inc"),
            rt.getField("is_empty").as("is_empty"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT * FROM (VALUES
          (1, 'monday', 'tuesday', 1, 2, true, true, false),
          (2, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS INT), false, false, false),
          (3, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS INT), false, false, true),
          (4, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN)),
          (5, 'friday', CAST(NULL AS VARCHAR), 5, CAST(NULL AS INT), true, false, false)
        ) t(id, t_lo, t_hi, i_lo, i_hi, lo_inc, hi_inc, is_empty) ORDER BY id""")),

    // ---- t21: conversion throughput at fact-table scale (the bench
    // headline for the type layer): synthesize PG text forms from
    // lineitem (600k rows at sf0.1), push them through uuid/decimal/
    // date/time conversions, and aggregate so Catalyst cannot prune the
    // conversion work. Every aggregate is exact (decimal sum, string
    // min/max, long max) so the oracle hash-matches.
    QueryDef(
      "t21_bulk_convert",
      (s, d) => {
        val li = graft.Tables.lineitem(s, d)
        val m = md5(concat(col("l_orderkey").cast(StringType), lit("-"),
          col("l_linenumber").cast(StringType)))
        val textForms = li.select(
          concat(substring(m, 1, 8), lit("-"), substring(m, 9, 4), lit("-"),
            substring(m, 13, 4), lit("-"), substring(m, 17, 4), lit("-"),
            substring(m, 21, 12)).as("uuid_t"),
          col("l_extendedprice").cast(DecimalType(12, 2)).cast(StringType).as("num_t"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("date_t"),
          date_format(col("l_shipdate"), "HH:mm:ss").as("time_t"))
        textForms.select(
          uuidToBinary(col("uuid_t")).as("uuid_b"),
          numericToDecimal(col("num_t"), 18, 9).as("price_d"),
          pgDate(col("date_t")).as("date_v"),
          pgTimeMicros(col("time_t")).as("time_us"))
          .groupBy(year(col("date_v")).as("y"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("price_d")).cast(DecimalType(27, 4)).cast(DoubleType).as("total_price"),
            min(hex(col("uuid_b"))).as("min_uuid_hex"),
            max(col("time_us")).as("max_time_us"))
          .orderBy(col("y"))
      },
      Some("""
        WITH m AS (
          SELECT md5(concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))) AS mm,
                 CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS num_t,
                 strftime(l_shipdate, '%Y-%m-%d') AS date_t,
                 strftime(l_shipdate, '%H:%M:%S') AS time_t
          FROM lineitem),
        conv AS (
          SELECT unhex(concat(substr(mm,1,8), substr(mm,9,4), substr(mm,13,4),
                   substr(mm,17,4), substr(mm,21,12))) AS uuid_b,
                 CAST(num_t AS DECIMAL(18,9)) AS price_d,
                 CAST(date_t AS DATE) AS date_v,
                 epoch_us(CAST(concat('1970-01-01 ', time_t) AS TIMESTAMP)) AS time_us
          FROM m)
        SELECT CAST(YEAR(date_v) AS INT) AS y, COUNT(*) AS n,
               CAST(CAST(ROUND(SUM(price_d), 4) AS DECIMAL(27,4)) AS DOUBLE) AS total_price,
               MIN(hex(uuid_b)) AS min_uuid_hex,
               CAST(MAX(time_us) AS BIGINT) AS max_time_us
        FROM conv GROUP BY YEAR(date_v) ORDER BY y"""),
      headline = true),

    // ---- t22: T21 inet + xml text passthrough (reference keeps both
    // textual, postgres_cloner.rs:592-600), T29 domain unwrap — the
    // catalog-driven recipe resolves a domain transparently to its base
    // type's conversion (postgres_cloner.rs:498-500), here
    // posint := domain over int4 — and T14 jsonb through the SAME
    // catalog recipe path (postgres_cloner.rs:603-607): the r04 verdict
    // found jsonb reached PgSchema.simpleType but not
    // PgTypeMapper.convert, so a live jsonb export crashed; this column
    // keeps the dispatch driver-gated.
    QueryDef(
      "t22_inet_xml_domain",
      (s, _) => {
        import s.implicits._
        import graft.sources.PgSchema
        Seq(
          (1, "192.168.100.128/25", "<a>x</a>", "42", """{"a": [1, 2]}"""),
          (2, "2001:db8::1", "<b/>", "-7", """"bare string""""),
          (3, null, null, null, null))
          .toDF("id", "ip", "x", "dv", "jb")
          .select(col("id"),
            PgTypeMapper.convert("inet", col("ip"), PgSettings()).as("inet_v"),
            PgTypeMapper.convert("xml", col("x"), PgSettings()).as("xml_v"),
            PgSchema.recipe(PgSchema.PgDomain(PgSchema.PgSimple("int4")),
              col("dv"), PgSettings()).as("domain_v"),
            PgSchema.recipe(PgSchema.PgSimple("jsonb"),
              col("jb"), PgSettings()).as("jsonb_v"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT * FROM (VALUES
          (1, '192.168.100.128/25', '<a>x</a>', 42, '{"a": [1, 2]}'),
          (2, '2001:db8::1', '<b/>', -7, '"bare string"'),
          (3, NULL, NULL, CAST(NULL AS INT), NULL)
        ) t(id, inet_v, xml_v, domain_v, jsonb_v) ORDER BY id""")),

    // ---- t23: F13 range arrays + F15 enum arrays + quoted text arrays
    // through the quote-aware array grammar (test_arrays.py:58-92,
    // test_custom_types.py:13-92). Each range struct flattens to a
    // 'lo|hi|li|ui|empty' token for the driver; the real
    // array⟨struct⟩/array⟨int⟩ shapes round-trip in TypesFixtureSpec.
    QueryDef(
      "t23_range_enum_arrays",
      (s, _) => {
        def fr(r: Column): Column =
          when(r.isNull, lit(null).cast(StringType))
            .otherwise(concat_ws("|",
              coalesce(r.getField("lower").cast(StringType), lit("N")),
              coalesce(r.getField("upper").cast(StringType), lit("N")),
              r.getField("lower_inclusive").cast(StringType),
              r.getField("upper_inclusive").cast(StringType),
              r.getField("is_empty").cast(StringType)))
        t23Nested(s)
          .select(col("id"),
            canonArray(col("range_arr"), fr).as("range_arr_s"),
            canonArray(col("enum_arr")).as("enum_arr_s"),
            canonArray(col("text_arr")).as("text_arr_s"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT * FROM (VALUES
          (1, '[1|3|true|false|false,N|N|false|false|true]', '[1,7]', '["a,b","c\"d"]'),
          (2, '[N|3|false|false|false,NULL,3|N|true|false|false]', '[NULL,5]', '[NULL,"NULL",plain]'),
          (3, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
          (4, '[]', '[]', '[]')
        ) t(id, range_arr_s, enum_arr_s, text_arr_s) ORDER BY id""")),

    // ---- t24: T10 money from its text transfer ('$1,234.56' → exact
    // Decimal(18,2); the binary-wire cents path is t05) and the
    // Dimensions array mode — {data, dims} WITHOUT lower_bound,
    // the reference's SchemaSettingsArrayHandling::Dimensions
    // (postgres_cloner.rs:103-109). Struct flattens per driver rules;
    // the no-lower_bound schema is asserted in PgSchemaSpec.
    QueryDef(
      "t24_money_dims_mode",
      (s, _) => {
        import s.implicits._
        import graft.sources.PgSchema
        val dims = PgSettings(arrayHandling = "dims")
        val arr = PgSchema.recipe(
          PgSchema.PgArray(PgSchema.PgSimple("int8")), col("arr_t"), dims)
        Seq(
          (1, "$1,234.56", "{{1,2},{3,4}}"),
          (2, "-$0.42", "[-2:0]={10,20,30}"),
          (3, null, "{}"),
          (4, "$0.07", null))
          .toDF("id", "v", "arr_t")
          .select(col("id"),
            PgTypeMapper.convert("money", col("v"), dims)
              .cast(StringType).as("money_v"),
            canonArray(arr.getField("data")).as("data_s"),
            canonArray(arr.getField("dims")).as("dims_s"))
          .orderBy(col("id"))
      },
      Some("""
        SELECT * FROM (VALUES
          (1, '1234.56', '[1,2,3,4]', '[2,2]'),
          (2, '-0.42', '[10,20,30]', '[3]'),
          (3, CAST(NULL AS VARCHAR), '[]', '[]'),
          (4, '0.07', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
        ) t(id, money_v, data_s, dims_s) ORDER BY id"""))
  )
}
