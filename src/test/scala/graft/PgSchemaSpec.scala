package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.sources.PgSchema._
import graft.functions.PgConversions.PgSettings

/** Catalog resolution + schema/recipe recursion against a canned
  * pg_catalog (the shapes the reference's py-tests create:
  * weekday enum, weekday_range, chain_id composite, arrays, domains). */
class PgSchemaSpec extends AnyFunSuite {

  private val catalog = PgCatalog(
    types = Seq(
      PgTypeRow(21, "int2", "b", 0, 0, 0, 0),
      PgTypeRow(23, "int4", "b", 0, 0, 0, 0),
      PgTypeRow(20, "int8", "b", 0, 0, 0, 0),
      PgTypeRow(25, "text", "b", 0, 0, 0, 0),
      PgTypeRow(1042, "bpchar", "b", 0, 0, 0, 0),
      PgTypeRow(1700, "numeric", "b", 0, 0, 0, 0),
      PgTypeRow(1007, "_int4", "b", 23, 0, 0, 0),     // int4[]
      PgTypeRow(3904, "int4range", "r", 0, 0, 0, 23),
      PgTypeRow(3905, "_int4range", "b", 3904, 0, 0, 0), // int4range[]
      PgTypeRow(60000, "weekday", "e", 0, 0, 0, 0),
      PgTypeRow(60001, "weekday_range", "r", 0, 0, 0, 60000),
      PgTypeRow(60002, "chain_id", "c", 0, 0, 77, 0),
      PgTypeRow(60003, "posint", "d", 0, 23, 0, 0)),  // domain over int4
    enums = (Seq("monday", "tuesday", "wednesday", "thursday", "friday",
      "saturday", "sunday").zipWithIndex.map { case (l, i) =>
        PgEnumRow(60000, i + 1.0, l) }).reverse, // order comes from sortorder, not row order
    attrs = Seq(
      PgAttributeRow(77, 2, "model", 23),
      PgAttributeRow(77, 1, "pdbid", 1042),
      PgAttributeRow(77, 3, "chain", 1042),
      // table t_exp(id int4, rng int4range, wd weekday, tags int4[])
      PgAttributeRow(501, 1, "id", 23),
      PgAttributeRow(501, 2, "rng", 3904),
      PgAttributeRow(501, 3, "wd", 60000),
      PgAttributeRow(501, 4, "tags", 1007)),
    classes = Seq(PgClassRow(501, "t_exp", "public"), PgClassRow(502, "other", "public"),
      // same relname in two non-public schemas + a mixed-case quoted name
      PgClassRow(503, "dup", "audit"), PgClassRow(504, "dup", "staging"),
      PgClassRow(505, "Cased", "public")))

  private val dflt = PgSettings()

  test("resolve: enum labels in sortorder, domain unwrap, array, range, composite") {
    assert(catalog.resolve(60000) == PgEnum("weekday", Seq("monday", "tuesday",
      "wednesday", "thursday", "friday", "saturday", "sunday")))
    assert(catalog.resolve(60003) == PgDomain(PgSimple("int4")))
    assert(catalog.resolve(1007) == PgArray(PgSimple("int4")))
    assert(catalog.resolve(60001) == PgRange(PgEnum("weekday", Seq("monday",
      "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday"))))
    assert(catalog.resolve(60002) == PgComposite("chain_id", Seq(
      "pdbid" -> PgSimple("bpchar"), "model" -> PgSimple("int4"),
      "chain" -> PgSimple("bpchar"))))
  }

  test("toSparkType: settings-dependent targets") {
    assert(toSparkType(catalog.resolve(60001), dflt) == StructType(Seq(
      StructField("lower", StringType), StructField("upper", StringType),
      StructField("lower_inclusive", BooleanType),
      StructField("upper_inclusive", BooleanType),
      StructField("is_empty", BooleanType))))
    assert(toSparkType(catalog.resolve(60000), dflt.copy(enumHandling = "int")) == IntegerType)
    assert(toSparkType(catalog.resolve(1007), dflt) == ArrayType(IntegerType))
    // reference's Dimensions mode has no lower_bound; dims+lb does
    assert(toSparkType(catalog.resolve(1007), dflt.copy(arrayHandling = "dims"))
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("data", "dims"))
    assert(toSparkType(catalog.resolve(1007), dflt.copy(arrayHandling = "dims+lb"))
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("data", "dims", "lower_bound"))
    assert(toSparkType(PgSimple("numeric"),
      dflt.copy(numericHandling = "decimal", decimalPrecision = 76)) == BinaryType)
    assert(toSparkType(catalog.resolve(60003), dflt) == IntegerType) // domain → base
  }

  test("recipe: range-of-enum end-to-end matches the t20 fixture semantics") {
    val spark = TestSpark.spark
    import spark.implicits._
    val kind = catalog.resolve(60001)
    val out = Seq((1, "[monday,tuesday]"), (2, "empty"))
      .toDF("id", "v")
      .select(col("id"),
        recipe(kind, col("v"), dflt.copy(enumHandling = "int")).as("r"))
      .orderBy(col("id")).collect()
    assert(out(0).getStruct(1).getInt(0) == 1) // monday → 1
    assert(out(0).getStruct(1).getInt(1) == 2) // tuesday → 2
    assert(out(1).getStruct(1).getBoolean(4))  // empty → is_empty
  }

  test("recipe: range ARRAY (F13) — quote-aware elements through the catalog path") {
    val spark = TestSpark.spark
    import spark.implicits._
    val kind = catalog.resolve(3905)
    assert(kind == PgArray(PgRange(PgSimple("int4"))))
    val out = Seq((1, "{\"[1,3)\",empty,NULL}"), (2, "{}"), (3, null))
      .toDF("id", "v")
      .select(col("id"), recipe(kind, col("v"), dflt).as("ra"))
      .orderBy(col("id")).collect()
    assert(out(0).getSeq[org.apache.spark.sql.Row](1).head
      .toSeq == Seq(1, 3, true, false, false))
    assert(out(0).getSeq[Any](1)(1)
      .asInstanceOf[org.apache.spark.sql.Row].getBoolean(4)) // empty → is_empty
    assert(out(0).getSeq[Any](1)(2) == null)                 // NULL element
    assert(out(1).getSeq[Any](1).isEmpty)
    assert(out(2).isNullAt(1))
  }

  test("recipe: composite of scalars parses record text") {
    val spark = TestSpark.spark
    import spark.implicits._
    val kind = catalog.resolve(60002)
    val out = Seq((1, "(1ehz,42,A)")).toDF("id", "v")
      .select(recipe(kind, col("v"), dflt).as("c")).collect()
    assert(out(0).getStruct(0).getString(0) == "1ehz")
    assert(out(0).getStruct(0).getInt(1) == 42)
  }

  test("unknown simple type and unknown oid raise the T35 policy error") {
    intercept[IllegalArgumentException](simpleType("tsvector", dflt))
    intercept[IllegalArgumentException](catalog.resolve(99999))
  }

  test("tableKinds/resolveName: export-path type resolution") {
    val kinds = catalog.tableKinds("public.t_exp").get
    assert(kinds.map(_._1) == Seq("id", "rng", "wd", "tags"))
    assert(kinds(1)._2 == PgRange(PgSimple("int4")))
    assert(kinds(2)._2.isInstanceOf[PgEnum])
    assert(kinds(3)._2 == PgArray(PgSimple("int4")))
    assert(catalog.tableKinds("nope").isEmpty)
    // identifier folding: unquoted matches case-insensitively (PG folds
    // to lowercase), quoted keeps case; schema qualifier is honored
    assert(catalog.tableKinds("T_EXP").isDefined)   // folds to t_exp
    assert(catalog.tableKinds("\"T_EXP\"").isEmpty) // quoted: no such rel
    assert(catalog.tableKinds("\"Cased\"").isDefined)
    assert(catalog.tableKinds("cased").isEmpty)     // folded ≠ "Cased"
    assert(catalog.tableKinds("audit.dup").isDefined)
    assert(catalog.tableKinds("staging.dup").isDefined)
    assert(catalog.tableKinds("other.t_exp").isEmpty) // wrong schema ≠ fallback
    // ambiguous unqualified name (no public candidate) errors instead of
    // silently picking a schema
    val amb = intercept[IllegalArgumentException](catalog.tableKinds("dup"))
    assert(amb.getMessage.contains("audit") && amb.getMessage.contains("staging"))
    // statement-describe names: catalog types recurse, extension
    // scalars absent from the catalog fall back to simple
    assert(catalog.resolveName("_int4") == PgArray(PgSimple("int4")))
    assert(catalog.resolveName("int4range") == PgRange(PgSimple("int4")))
    assert(catalog.resolveName("vector") == PgSimple("vector"))
  }

  test("resolveName: same-named types across schemas refuse to guess") {
    // multi-tenant catalogs routinely define the same enum name per
    // schema; an arbitrary pick would silently convert with the wrong
    // labels, so disambiguation mirrors tableKinds
    val multi = PgCatalog(
      types = Seq(
        PgTypeRow(23, "int4", "b", 0, 0, 0, 0, "pg_catalog"),
        // a user schema shadowing a built-in name: the built-in wins
        // (pg_catalog leads every search_path)
        PgTypeRow(70001, "int4", "e", 0, 0, 0, 0, "tenant_a"),
        PgTypeRow(70002, "status", "e", 0, 0, 0, 0, "tenant_a"),
        PgTypeRow(70003, "status", "e", 0, 0, 0, 0, "tenant_b"),
        PgTypeRow(70004, "level", "e", 0, 0, 0, 0, "public"),
        PgTypeRow(70005, "level", "e", 0, 0, 0, 0, "tenant_a")),
      enums = Seq(
        PgEnumRow(70002, 1.0, "a_one"), PgEnumRow(70003, 1.0, "b_one"),
        PgEnumRow(70004, 1.0, "pub_one"), PgEnumRow(70005, 1.0, "ten_one")),
      attrs = Nil)
    assert(multi.resolveName("int4") == PgSimple("int4"))
    assert(multi.resolveName("level") == PgEnum("level", Seq("pub_one")))
    val e = intercept[IllegalArgumentException](multi.resolveName("status"))
    assert(e.getMessage.contains("tenant_a") && e.getMessage.contains("tenant_b"))
    // a qualified name picks the exact schema; unknown names still fall
    // back to simple (extension scalars)
    assert(multi.resolveName("tenant_b.status") == PgEnum("status", Seq("b_one")))
    assert(multi.resolveName("halfvec") == PgSimple("halfvec"))
  }

  test("conversion edges: temporal specials, char octal, money overflow, sparsevec shape") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.PgConversions._
    // PG-legal temporal values with no Spark representation → NULL;
    // ordinary values still parse; garbage still errors (ANSI cast)
    val d = Seq("2020-01-02", "infinity", "-infinity", "0001-01-01 BC")
      .toDF("v").select(pgDate(col("v")).as("d")).collect()
    assert(d(0).getDate(0).toString == "2020-01-02")
    assert(d(1).isNullAt(0) && d(2).isNullAt(0) && d(3).isNullAt(0))
    intercept[Exception](Seq("not-a-date").toDF("v")
      .select(pgDate(col("v"))).collect())
    val ts = Seq("infinity", "2024-01-02 03:04:05+00").toDF("v")
      .select(pgTimestampTz(col("v")).as("t")).collect()
    assert(ts(0).isNullAt(0) && !ts(1).isNullAt(0))
    // "char" text form: PG 14+ octal escape for high bytes decodes to
    // the byte value (not ascii('\\') = 92); plain chars keep their code
    val ch = Seq("A", "\\310", "").toDF("v")
      .select(pgCharFromText(col("v")).as("c")).collect()
    assert(ch(0).getShort(0) == 65)
    assert(ch(1).getShort(0) == 200)
    assert(ch(2).getShort(0) == 0) // '' is the zero byte
    // multi-character text is NOT a single byte: it must error (O22),
    // not silently take the first char's code (ADVICE r08)
    val chBad = intercept[Exception](Seq("ab").toDF("v")
      .select(pgCharFromText(col("v"))).collect())
    assert(chBad.getMessage.contains("single byte") ||
      Option(chBad.getCause).exists(_.getMessage.contains("single byte")))
    // money beyond Decimal(18,2) → NULL (T7 overflow policy), both forms
    val m = Seq("$1,234.56", "$92,233,720,368,547,758.07").toDF("v")
      .select(moneyFromText(col("v")).as("m")).collect()
    assert(m(0).getDecimal(0).toString == "1234.56" && m(1).isNullAt(0))
    // …but malformed money text still ERRORS with the value (O22) —
    // only the legal-overflow case may go to NULL
    val malformed = intercept[Exception](Seq("12.34.56").toDF("v")
      .select(moneyFromText(col("v"))).collect())
    assert(malformed.getMessage.contains("money") ||
      Option(malformed.getCause).exists(_.getMessage.contains("money")))
    val mc = Seq(12345L, Long.MaxValue).toDF("v")
      .select(moneyToDecimal(col("v")).as("m")).collect()
    assert(mc(0).getDecimal(0).toString == "123.45" && mc(1).isNullAt(0))
    // p>38 numeric: ±Infinity (PG 14+) and over-precision values → NULL
    // like the p≤38 try_cast path, instead of a task-killing exception
    val nb = Seq("Infinity", "-Infinity", "123.45", "12345678901.0").toDF("v")
      .select(graft.functions.PgConversions
        .numericToBigDecimalBytes(col("v"), precision = 10, scale = 2).as("b"))
      .collect()
    assert(nb(0).isNullAt(0) && nb(1).isNullAt(0))
    assert(nb(2).getAs[Array[Byte]](0) != null) // 12345 unscaled: 5 ≤ 10 digits
    assert(nb(3).isNullAt(0))                   // 13 unscaled digits > 10
    // sparsevec: brace-less garbage errors with the value instead of
    // silently exporting an empty map; the genuine '{}/n' stays empty
    val sv = Seq("{}/10", "{1:2.5}/10").toDF("v")
      .select(sparsevecFromText(col("v")).as("s")).collect()
    assert(sv(0).getMap[Int, Float](0).isEmpty)
    assert(sv(1).getMap[Int, Float](0) == Map(1 -> 2.5f))
    val err = intercept[Exception](Seq("garbage").toDF("v")
      .select(sparsevecFromText(col("v"))).collect())
    assert(err.getMessage.contains("sparsevec") ||
      Option(err.getCause).exists(_.getMessage.contains("sparsevec")))
  }

  test("sparsevec parse round-trips random maps exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.PgConversions._
    // randomized T34 guard: arbitrary entry counts (incl. the empty
    // '{}/d' map), arbitrary 1-based indices, full-precision float
    // text (Float.toString round-trips through cast exactly) — the
    // fixture pins only hand-picked shapes
    val rnd = new scala.util.Random(17)
    val cases = (1 to 60).map { _ =>
      val dims = 10 + rnd.nextInt(90)
      val idx = rnd.shuffle((1 to dims).toList).take(rnd.nextInt(8)).sorted
      val m = idx.map(i => i -> (rnd.nextFloat() * 200f - 100f)).toMap
      val text = "{" + idx.map(i => s"$i:${m(i)}").mkString(",") + s"}/$dims"
      (text, m)
    }
    val parsed = cases.map(_._1).toDF("v")
      .select(sparsevecFromText(col("v")).as("s")).collect()
    cases.zip(parsed).foreach { case ((text, m), row) =>
      assert(row.getMap[Int, Float](0) == m, text)
    }
  }

  test("timetz/cidr/macaddr8 transfer as canonical pg text (beyond-reference)") {
    val spark = TestSpark.spark
    import spark.implicits._
    assert(simpleType("timetz", dflt) == StringType)
    assert(simpleType("cidr", dflt) == StringType)
    assert(simpleType("macaddr8", dflt) == StringType)
    val df = Seq(("12:34:56.789+02", "10.1.0.0/16", "08:00:2b:01:02:03:04:05"))
      .toDF("t", "c", "m")
    val out = df.select(
      graft.functions.PgTypeMapper.convert("timetz", col("t"), dflt).as("t"),
      graft.functions.PgTypeMapper.convert("cidr", col("c"), dflt).as("c"),
      graft.functions.PgTypeMapper.convert("macaddr8", col("m"), dflt).as("m"))
      .collect()(0)
    assert(out.getString(0) == "12:34:56.789+02")
    assert(out.getString(1) == "10.1.0.0/16")
    assert(out.getString(2) == "08:00:2b:01:02:03:04:05")
  }

  test("convertScan: dialect-typed columns pass, text transfers convert") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.types.{Decimal => _, _}
    val df = Seq(
      (1, "[1,5)", "[0.5,2]", "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11", BigDecimal("12.50")),
      (2, "empty", null, null, null))
      .toDF("id", "rng", "vec", "u", "num")
    val kinds = Map[String, PgKind](
      "id" -> PgSimple("int4"),          // already IntegerType → untouched
      "rng" -> PgRange(PgSimple("int4")),
      "vec" -> PgSimple("vector"),
      "u" -> PgSimple("uuid"),
      "num" -> PgSimple("numeric"))      // decimal scan → default double
    val out = convertScan(df, kinds, dflt)
    assert(out.schema("id").dataType == IntegerType)
    assert(out.schema("rng").dataType.isInstanceOf[StructType])
    assert(out.schema("vec").dataType == ArrayType(FloatType))
    assert(out.schema("u").dataType == BinaryType)
    assert(out.schema("num").dataType == DoubleType)
    val r = out.orderBy(col("id")).collect()
    assert(r(0).getStruct(1).getInt(0) == 1)         // range lower
    assert(r(0).getSeq[Float](2) == Seq(0.5f, 2f))
    assert(r(0).getAs[Array[Byte]](3).length == 16)  // uuid bytes
    assert(r(0).getDouble(4) == 12.5)
    assert(r(1).getStruct(1).getBoolean(4))          // 'empty' range
  }

  test("convertScan: string-typed scans still run non-identity recipes (macaddr)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // target and scan type are both string, but the recipe normalizes —
    // the dt==target shortcut must not skip it (r05 review #4)
    val out = convertScan(
      Seq("08:00:2B:01:02:03").toDF("mac"),
      Map[String, PgKind]("mac" -> PgSimple("macaddr")), dflt)
    assert(out.collect()(0).getString(0) == "08-00-2b-01-02-03")
  }

  test("convertScan: domain over numeric converts like numeric; dup labels positional") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((BigDecimal("10.25"), "1", "2")).toDF("price", "id", "id")
    // price: CREATE DOMAIN price AS numeric — scan arrives as decimal,
    // default numeric-handling must still produce double (r05 review #3)
    val out = convertScanPositional(df,
      Seq(Some(PgDomain(PgSimple("numeric"))),
        Some(PgSimple("int4")), Some(PgSimple("int8"))), dflt)
    assert(out.schema.fields(0).dataType == DoubleType)
    // duplicate output labels (SELECT a.id, b.id) convert by position
    // instead of raising AMBIGUOUS_REFERENCE (r05 review #5)
    assert(out.schema.fields(1).dataType == IntegerType)
    assert(out.schema.fields(2).dataType == LongType)
    assert(out.columns.toSeq == Seq("price", "id", "id"))
    val r = out.collect()(0)
    assert(r.getDouble(0) == 10.25 && r.getInt(1) == 1 && r.getLong(2) == 2L)
  }

  test("recipe: jsonb dispatches through the catalog path (r04 gap)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // both json handlings are text passthrough on the text transfer;
    // the r04 bug was PgTypeMapper.convert throwing 'unsupported jsonb'
    val out = Seq((1, """{"a": 1}"""), (2, null)).toDF("id", "v")
      .select(col("id"), recipe(PgSimple("jsonb"), col("v"), dflt).as("j"),
        recipe(PgSimple("jsonb"), col("v"),
          dflt.copy(jsonHandling = "text-marked-json")).as("jm"))
      .orderBy(col("id")).collect()
    assert(out(0).getString(1) == """{"a": 1}""")
    assert(out(0).getString(2) == """{"a": 1}""")
    assert(out(1).isNullAt(1))
    // unknown handling values error explicitly instead of silently passing
    intercept[IllegalArgumentException](
      recipe(PgSimple("jsonb"), col("v"), dflt.copy(jsonHandling = "nope")))
    intercept[IllegalArgumentException](
      recipe(PgSimple("halfvec"), col("v"), dflt.copy(float16Handling = "nope")))
    // float16 storage mode is accepted (values identical to float32
    // mode; the FLBA(2) storage lands via the post-write transcode)
    recipe(PgSimple("halfvec"), col("v"), dflt.copy(float16Handling = "float16"))
  }

  test("recipe: dims mode drops lower_bound; money text form parses") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1, "[-2:0]={1,2,3}", "$1,234.56"), (2, "{{1},{2}}", "-$0.42"))
      .toDF("id", "arr", "m")
    val out = df.select(col("id"),
      recipe(PgArray(PgSimple("int8")), col("arr"),
        dflt.copy(arrayHandling = "dims")).as("a"),
      recipe(PgSimple("money"), col("m"), dflt).as("mv"))
      .orderBy(col("id")).collect()
    val schema = df.select(recipe(PgArray(PgSimple("int8")), col("arr"),
      dflt.copy(arrayHandling = "dims")).as("a")).schema
    assert(schema("a").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("data", "dims"))
    assert(out(0).getStruct(1).getSeq[Long](0) == Seq(1L, 2L, 3L))
    assert(out(1).getStruct(1).getSeq[Long](1) == Seq(2L, 1L)) // dims 2x1
    assert(out(0).getDecimal(2) == new java.math.BigDecimal("1234.56"))
    assert(out(1).getDecimal(2) == new java.math.BigDecimal("-0.42"))
  }

  test("recipe: nested composites of vectors (test_pgvector.py:128 shapes)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // cc_vector_wrapper(single vector, half halfvec);
    // cc_vector_array(wrappers cc_vector_wrapper[], halfarr halfvec, sparse sparsevec);
    // cc_vector_lvl3(arr cc_vector_array[], notarray cc_vector_wrapper)
    val wrapper = PgComposite("cc_vector_wrapper", Seq(
      "single" -> PgSimple("vector"), "half" -> PgSimple("halfvec")))
    val varr = PgComposite("cc_vector_array", Seq(
      "wrappers" -> PgArray(wrapper), "halfarr" -> PgSimple("halfvec"),
      "sparse" -> PgSimple("sparsevec")))
    val lvl3 = PgComposite("cc_vector_lvl3", Seq(
      "arr" -> PgArray(varr), "notarray" -> wrapper))

    // text forms as PG emits them: array elements backslash-escape
    // quotes, record fields double them — the escaping compounds per
    // nesting level (reference parses the same data from the binary
    // wire, pg_custom_types.rs:162-287; text is this engine's transfer)
    val aTxt = """{NULL,"(\"[1,2]\",\"[5,6]\")",NULL,"(\"[1,2]\",\"[5,6]\")",NULL}"""
    val bTxt = """("{""(\\""[1,2]\\"",\\""[5,6]\\"")"",NULL,""(\\""[1,2,3,4,5,6,7,8]\\"",)""}","[1,2]","{4:1,8:2}/10")"""
    val bEmpty = """("{}",,)"""
    val dTxt = """{"(,\"(,\"\"[1,2]\"\")\")",NULL}"""

    val out = Seq((1, aTxt, bTxt, dTxt), (2, null, bEmpty, null))
      .toDF("id", "a", "b", "d")
      .select(col("id"),
        recipe(PgArray(wrapper), col("a"), dflt).as("a"),
        recipe(varr, col("b"), dflt).as("b"),
        recipe(PgArray(lvl3), col("d"), dflt).as("d"))
      .orderBy(col("id")).collect()

    import org.apache.spark.sql.Row
    val a = out(0).getSeq[Row](1)
    assert(a.size == 5 && a(0) == null && a(2) == null && a(4) == null)
    assert(a(1).getSeq[Float](0) == Seq(1f, 2f) && a(1).getSeq[Float](1) == Seq(5f, 6f))
    val b = out(0).getStruct(2)
    val ws = b.getSeq[Row](0)
    assert(ws.size == 3 && ws(1) == null)
    assert(ws(0).getSeq[Float](0) == Seq(1f, 2f) && ws(0).getSeq[Float](1) == Seq(5f, 6f))
    assert(ws(2).getSeq[Float](0) == Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f))
    assert(ws(2).isNullAt(1)) // NULL half inside a twice-escaped record
    assert(b.getSeq[Float](1) == Seq(1f, 2f))
    assert(b.getMap[Int, Float](2) == Map(4 -> 1f, 8 -> 2f)) // sparsevec
    val d = out(0).getSeq[Row](3)
    assert(d.size == 2 && d(1) == null)
    assert(d(0).isNullAt(0)) // lvl3.arr NULL
    assert(d(0).getStruct(1).isNullAt(0)) // notarray.single NULL
    assert(d(0).getStruct(1).getSeq[Float](1) == Seq(1f, 2f)) // three levels deep
    // row 2: empty wrappers array ≠ NULL; NULL halfarr/sparse fields
    val b2 = out(1).getStruct(2)
    assert(b2.getSeq[Row](0).isEmpty && b2.isNullAt(1) && b2.isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).isNullAt(3))
  }

  test("recipe: bare `char` (catalog name) converts its text form to the code") {
    val spark = TestSpark.spark
    import spark.implicits._
    assert(simpleType("char", dflt) == ShortType)
    val out = Seq((1, "A"), (2, ""), (3, null)).toDF("id", "v")
      .select(col("id"), recipe(PgSimple("char"), col("v"), dflt).as("c"))
      .orderBy(col("id")).collect()
    assert(out(0).getShort(1) == 65)
    assert(out(1).getShort(1) == 0)   // '' is the zero byte
    assert(out(2).isNullAt(1))
  }

  test("annotationFor: json/enum/time annotate; mismatched physicals and nesting don't") {
    val s = PgSettings()
    // JSON annotation is opt-in (reference default json_handling=Text
    // writes plain UTF8, postgres_cloner.rs:125); the default must NOT
    // stamp it or --json-handling text is a dead option
    assert(annotationFor(PgSimple("json"), s).isEmpty)
    val marked = s.copy(jsonHandling = "text-marked-json")
    assert(annotationFor(PgSimple("json"), marked).contains("json"))
    assert(annotationFor(PgSimple("jsonb"), marked).contains("json"))
    assert(annotationFor(PgDomain(PgSimple("jsonb")), marked).contains("json"))
    assert(annotationFor(PgEnum("mood", Seq("sad", "ok")), s).contains("enum"))
    // enum-as-int lands as INT32 — no ENUM annotation applies; and
    // plain-text exists precisely to SUPPRESS the ENUM annotation
    assert(annotationFor(PgEnum("mood", Seq("sad")),
      s.copy(enumHandling = "int")).isEmpty)
    assert(annotationFor(PgEnum("mood", Seq("sad")),
      s.copy(enumHandling = "plain-text")).isEmpty)
    assert(annotationFor(PgSimple("time"), s).contains("time-micros"))
    // physical-type mismatches stay deviations
    assert(annotationFor(PgSimple("uuid"), s).isEmpty)
    assert(annotationFor(PgSimple("interval"), s).isEmpty)
    // nested json (array element) is not a top-level rewrite target
    assert(annotationFor(PgArray(PgSimple("json")), s).isEmpty)
    // "char" u8 annotates its INT32 physical footer-only
    assert(annotationFor(PgSimple("\"char\""), s).contains("uint8"))
    assert(annotationFor(PgSimple("char"), s).contains("uint8"))
  }

  test("transcodeFor: uuid always, interval only in bytes mode, nothing else") {
    val s = PgSettings()
    assert(transcodeFor(PgSimple("uuid"), s).contains("uuid"))
    assert(transcodeFor(PgDomain(PgSimple("uuid")), s).contains("uuid"))
    assert(transcodeFor(PgSimple("interval"), s).contains("interval"))
    assert(transcodeFor(PgSimple("interval"),
      s.copy(intervalHandling = "struct")).isEmpty)
    assert(transcodeFor(PgSimple("bytea"), s).isEmpty)
    assert(transcodeFor(PgArray(PgSimple("uuid")), s).isEmpty)
    // halfvec f16 storage is a leaf-path transcode, not a scalar one
    assert(float16LeafFor("emb", PgSimple("halfvec"), s).isEmpty)
    assert(float16LeafFor("emb", PgSimple("halfvec"),
      s.copy(float16Handling = "float16")).contains("emb.list.element"))
    // oid narrows back to u32-in-INT32
    assert(uint32For(PgSimple("oid")))
    assert(uint32For(PgDomain(PgSimple("oid"))))
    assert(!uint32For(PgSimple("int8")))
  }
}
