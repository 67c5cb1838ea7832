package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.functions.PgConversions
import graft.functions.PgConversions.PgSettings
import graft.functions.PgTypeMapper

/** O4 core: pg_catalog introspection → recursive type resolution →
  * Spark schema + per-column conversion recipe.
  *
  * This is the engine's equivalent of the reference's
  * `map_schema_column` recursion over `postgres::types::Kind`
  * (`cli/src/postgres_cloner.rs:429-561`): [[PgKind]] mirrors
  * `Kind::{Simple,Enum,Array,Domain,Range,Composite}`, [[PgSchema.toSparkType]]
  * mirrors the schema construction (array handling modes, range/composite
  * groups), and [[PgSchema.recipe]] mirrors the appender-tree
  * construction — except the "appender" is a Catalyst Column over the
  * text-form transfer, so Spark's Parquet writer does the Dremel
  * shredding (SURVEY §1.3).
  *
  * The catalog model is three relations, exactly what the introspection
  * queries in [[PgCatalog.IntrospectionSql]] return from a live server;
  * tests drive the same code from canned rows.
  */
object PgSchema {

  // ---- Kind ADT (postgres_cloner.rs:429: match t.kind())
  sealed trait PgKind
  final case class PgSimple(name: String) extends PgKind
  final case class PgEnum(name: String, labels: Seq[String]) extends PgKind
  final case class PgArray(elem: PgKind) extends PgKind
  final case class PgDomain(inner: PgKind) extends PgKind
  final case class PgRange(elem: PgKind) extends PgKind
  final case class PgComposite(name: String, fields: Seq[(String, PgKind)]) extends PgKind

  private def rangeStruct(bound: DataType) = StructType(Seq(
    StructField("lower", bound),
    StructField("upper", bound),
    StructField("lower_inclusive", BooleanType),
    StructField("upper_inclusive", BooleanType),
    StructField("is_empty", BooleanType)))

  /** Target Spark type per kind + settings (postgres_cloner.rs:434-558). */
  def toSparkType(kind: PgKind, s: PgSettings): DataType = kind match {
    case PgSimple(name) => simpleType(name, s)
    case PgEnum(_, _) =>
      if (s.enumHandling == "int") IntegerType else StringType
    case PgArray(elem) => s.arrayHandling match {
      case "plain" => ArrayType(toSparkType(elem, s))
      case "dims" => StructType(Seq( // Dimensions mode: no lower_bound
        StructField("data", ArrayType(toSparkType(elem, s))),
        StructField("dims", ArrayType(LongType))))
      case _ => StructType(Seq( // dims+lb (DimensionsAndLowerBound)
        StructField("data", ArrayType(toSparkType(elem, s))),
        StructField("dims", ArrayType(LongType)),
        StructField("lower_bound", ArrayType(IntegerType))))
    }
    case PgDomain(inner) => toSparkType(inner, s) // transparent unwrap (:498-500)
    case PgRange(elem) => rangeStruct(toSparkType(elem, s))
    case PgComposite(_, fields) =>
      StructType(fields.map { case (n, k) => StructField(n, toSparkType(k, s)) })
  }

  /** map_simple_type (postgres_cloner.rs:578-699) as a type table. */
  def simpleType(name: String, s: PgSettings): DataType = name match {
    case "bool" => BooleanType
    case "int2" => ShortType
    case "int4" => IntegerType
    case "int8" => LongType
    case "oid" => LongType
    case "\"char\"" | "char" => ShortType
    case "float4" => FloatType
    case "float8" => DoubleType
    case "numeric" => s.numericHandling match {
      case "decimal" =>
        if (s.decimalPrecision > 38) BinaryType
        else DecimalType(s.decimalPrecision, s.decimalScale)
      case "double" => DoubleType
      case "float32" => FloatType
      case _ => StringType
    }
    case "money" => DecimalType(18, 2)
    case "bytea" | "uuid" => BinaryType
    case "macaddr" => s.macaddrHandling match {
      case "byte-array" => BinaryType
      case "int64" => LongType
      case _ => StringType
    }
    // timetz/cidr/macaddr8 keep their canonical pg text form (beyond
    // reference, which TODO-lists all three as unsupported —
    // postgres_cloner.rs:655; timetz has no Spark type that carries
    // the offset, and the network types are plain text anyway)
    case "name" | "text" | "xml" | "bpchar" | "varchar" | "citext" |
         "json" | "jsonb" | "inet" | "cidr" | "macaddr8" | "timetz" |
         "bit" | "varbit" => StringType
    case "date" => DateType
    case "time" => LongType
    case "timestamp" => TimestampNTZType
    case "timestamptz" => TimestampType
    case "interval" =>
      if (s.intervalHandling == "struct")
        StructType(Seq(StructField("months", IntegerType),
          StructField("days", IntegerType), StructField("microseconds", LongType)))
      else BinaryType
    case "vector" | "halfvec" => ArrayType(FloatType)
    case "sparsevec" => MapType(IntegerType, FloatType)
    case other => throw new IllegalArgumentException(
      s"unsupported simple type '$other' — cast to ::text in the query (T35 policy)")
  }

  /** The conversion Column for a text-form transfer of `kind` — the
    * appender-tree equivalent. The recursion composes to arbitrary
    * depth: each level's tokenizer unescapes its own quoting convention
    * (arrays backslash-escape, records double quotes) before handing
    * the field text to the inner recipe, so array⟨composite⟨array⟨…⟩⟩⟩
    * shapes — the reference's test_pgvector.py:128 level-3 nesting —
    * parse from the text transfer (PgSchemaSpec "nested composites").
    * Truly unknown simple types still hit the T35 ::text policy. */
  def recipe(kind: PgKind, c: Column, s: PgSettings): Column = kind match {
    case PgSimple(name) => PgTypeMapper.convert(name, c, s)
    case PgEnum(_, labels) =>
      if (s.enumHandling == "int") PgConversions.enumToInt(c, labels) else c
    case PgDomain(inner) => recipe(inner, c, s)
    case PgRange(elem) =>
      // bounds arrive unquoted/unescaped from the range tokenizer
      PgConversions.rangeToStruct(c, e => recipe(elem, e, s))
    case PgComposite(_, fields) =>
      PgConversions.compositeToStruct(c,
        fields.map { case (n, k) => n -> ((f: Column) => recipe(k, f, s)) })
    case PgArray(elem) if s.arrayHandling == "plain" =>
      PgConversions.arrayFromText(c, e => recipe(elem, e, s))
    case PgArray(elem) if s.arrayHandling == "dims" => // Dimensions mode
      PgConversions.multidimToStructOfDims(c, e => recipe(elem, e, s))
    case PgArray(elem) => // dims+lb mode (T31), any scalar subtype
      PgConversions.multidimToStructOf(c, e => recipe(elem, e, s))
    case other => throw new IllegalArgumentException(
      s"no text recipe for $other — cast to ::text in the query (T35 policy)")
  }

  /** Post-scan conversion layer for a JDBC export — the engine's
    * appender-tree application point ([[graft.Main.runExport]] calls
    * this per exported DataFrame; reference equivalent:
    * `map_schema_root` → appender per column, postgres_cloner.rs:316-428).
    *
    * Per column: if the dialect-typed scan already delivered the
    * settings' target Spark type, pass through (pgjdbc decodes standard
    * scalars natively); if the transfer is text-form (OTHER/extension
    * types — uuid, interval, vector, ranges, composites, enums, …),
    * apply the full [[recipe]]; numeric columns arrive as the scan
    * metadata's decimal and get the numeric handling applied through
    * their text form (the reference's default exports numeric as
    * double). Anything else passes through unchanged. */
  def convertScan(df: DataFrame, kinds: Map[String, PgKind], s: PgSettings): DataFrame =
    convertScanPositional(df, df.columns.toSeq.map(kinds.get), s)

  /** Positional variant: `kinds(i)` applies to the scan's i-th column.
    * This is the only correct resolution for `--query` exports, whose
    * output may carry duplicate labels (`SELECT a.id, b.id …`) that
    * by-name `col(...)` resolution would reject as ambiguous. Columns
    * are renamed to unique placeholders for the select and aliased back,
    * so duplicate-labeled outputs convert fine (Spark's parquet sink
    * itself still refuses duplicate names at write time — its limit,
    * surfaced with its own clear message). */
  def convertScanPositional(
      df: DataFrame, kinds: Seq[Option[PgKind]], s: PgSettings): DataFrame = {
    import org.apache.spark.sql.functions.col
    val names = df.columns.toSeq
    val renamed = df.toDF(names.indices.map(i => s"__graft_c$i"): _*)
    val cols = renamed.schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      val converted = kinds.lift(i).flatten match {
        case Some(kind) =>
          val target = toSparkType(kind, s)
          (f.dataType, baseKind(kind)) match {
            // a text transfer ALWAYS runs its recipe — even when the
            // target is also string the recipe may normalize (macaddr's
            // canonical dash form); for passthrough kinds it is identity
            case (StringType, _) => recipe(kind, col(f.name), s)
            case (dt, _) if dt == target => col(f.name)
            // a scan that already decoded numeric (generic JDBC mapping)
            // still gets the numeric handling, through its text form
            case (_: DecimalType, PgSimple("numeric")) =>
              PgTypeMapper.convert("numeric", col(f.name).cast(StringType), s)
            case _ => col(f.name)
          }
        case None => col(f.name)
      }
      converted.as(names(i))
    }
    renamed.select(cols: _*)
  }

  /** Domains are transparent at every decision point (reference unwraps
    * before dispatch, postgres_cloner.rs:498-500) — a domain over
    * numeric must take the numeric branch, not fall through. */
  private def baseKind(kind: PgKind): PgKind = kind match {
    case PgDomain(inner) => baseKind(inner)
    case k => k
  }

  /** Key into [[ParquetAnnotations.Annotations]] for the logical type
    * the reference stamps on this column's parquet type, when the
    * Spark-written PHYSICAL type admits a footer-only re-annotation
    * (`cli/src/postgres_cloner.rs:560-607`): json/jsonb text → JSON,
    * enum-as-text → ENUM, time-of-day micros → TIME(µs). Kinds whose
    * reference annotation needs a different physical type (uuid
    * FLBA(16), interval FLBA(12), halfvec FLBA(2), unsigned ints) stay
    * documented deviations; nested occurrences are left untouched. */
  def annotationFor(kind: PgKind, s: PgSettings): Option[String] =
    baseKind(kind) match {
      // the JSON annotation is OPT-IN, exactly like the reference:
      // json_handling Text (the default — "DuckDB doesn't load JSON
      // converted type", postgres_cloner.rs:125) writes plain UTF8,
      // TextMarkedAsJson stamps LogicalType::Json (:604-607)
      case PgSimple("json") | PgSimple("jsonb")
          if s.jsonHandling == "text-marked-json" => Some("json")
      // enum 'text' stamps ENUM; 'plain-text' exists precisely to
      // suppress it (String only, postgres_cloner.rs:450); 'int' is
      // an INT32 physical — nothing to annotate
      case _: PgEnum if s.enumHandling == "text" => Some("enum")
      case PgSimple("time") => Some("time-micros")
      // "char" u8 rides the INT32 physical its ShortType transfer
      // produced; the reference annotates UInt8 (postgres_cloner.rs:449)
      case PgSimple("char") | PgSimple("\"char\"") => Some("uint8")
      case _ => None
    }

  /** Key into [[ParquetTranscode.Targets]] for columns whose reference
    * parquet form needs a fixed-width PHYSICAL type Spark can't write:
    * uuid → FLBA(16)+UUID (postgres_cloner.rs:552-558), raw interval →
    * FLBA(12)+INTERVAL (:570-584). Applied as a post-write value
    * re-encode; struct-mode interval needs no transcode. */
  def transcodeFor(kind: PgKind, s: PgSettings): Option[String] =
    baseKind(kind) match {
      case PgSimple("uuid") => Some("uuid")
      case PgSimple("interval") if s.intervalHandling == "interval" =>
        Some("interval")
      case _ => None
    }

  /** Dotted parquet leaf path (relative to column `name`) that must
    * transcode FLOAT → FLBA(2)+FLOAT16 — halfvec columns under
    * `--float16-handling float16` (postgres_cloner.rs:660-666). The
    * `.list.element` segments are Spark's 3-level list encoding. */
  def float16LeafFor(name: String, kind: PgKind, s: PgSettings): Option[String] =
    baseKind(kind) match {
      case PgSimple("halfvec") if s.float16Handling == "float16" =>
        Some(s"$name.list.element")
      case _ => None
    }

  /** oid is u32 in pg; the reference stores it INT32 + UInt32
    * (postgres_cloner.rs:448). The scan widens to LongType so every
    * value survives Spark; the post-write transcode narrows back to
    * the u32 bit pattern in INT32. */
  def uint32For(kind: PgKind): Boolean =
    baseKind(kind) == PgSimple("oid")

  // ---- catalog model (what IntrospectionSql returns)

  final case class PgTypeRow(
      oid: Long, name: String, typtype: String,
      elemOid: Long, baseOid: Long, relOid: Long, rangeSubtypeOid: Long,
      nspname: String = "public")
  final case class PgEnumRow(enumTypeOid: Long, sortOrder: Double, label: String)
  final case class PgAttributeRow(relOid: Long, num: Int, name: String, typeOid: Long)
  final case class PgClassRow(oid: Long, relname: String, nspname: String = "public")

  final case class PgCatalog(
      types: Seq[PgTypeRow],
      enums: Seq[PgEnumRow],
      attrs: Seq[PgAttributeRow],
      classes: Seq[PgClassRow] = Nil) {

    private val byOid = types.map(t => t.oid -> t).toMap

    /** postgres_cloner.rs:429-561 Kind resolution from catalog rows. */
    def resolve(oid: Long): PgKind = {
      val t = byOid.getOrElse(oid,
        throw new IllegalArgumentException(s"unknown type oid $oid"))
      t.typtype match {
        case "e" => PgEnum(t.name,
          enums.filter(_.enumTypeOid == oid).sortBy(_.sortOrder).map(_.label))
        case "d" => PgDomain(resolve(t.baseOid))
        case "r" => PgRange(resolve(t.rangeSubtypeOid))
        case "c" => PgComposite(t.name,
          attrs.filter(_.relOid == t.relOid).sortBy(_.num)
            .map(a => a.name -> resolve(a.typeOid)))
        case _ if t.elemOid != 0 && t.name.startsWith("_") =>
          PgArray(resolve(t.elemOid)) // pg array types: _elemname
        case _ => PgSimple(t.name)
      }
    }

    /** Kind for a pg type NAME (what JDBC statement metadata reports for
      * a query's output columns). Names absent from the catalog resolve
      * as simple types — extension scalars like vector need no catalog
      * recursion, and truly unknown names hit the T35 policy at
      * conversion time.
      *
      * The same NAME can exist in several schemas (multi-tenant
      * databases routinely define `tenant_a.status` and
      * `tenant_b.status`); picking an arbitrary row would silently
      * convert with the wrong labels/shape, so disambiguation mirrors
      * [[tableKinds]]: `pg_catalog` wins (built-ins lead every
      * search_path), then a unique `public` row, otherwise error — the
      * caller can qualify the name (`schema.type`) or cast the column
      * to `::text`. */
    def resolveName(typeName: String): PgKind = {
      val (schema, bare) = parseQualifiedName(typeName)
      val matches = schema match {
        case Some(ns) => types.filter(t => t.nspname == ns && t.name == bare)
        case None =>
          val all = types.filter(_.name == bare)
          if (all.size <= 1) all
          else all.filter(_.nspname == "pg_catalog") match {
            case Seq(builtin) => Seq(builtin)
            case _ =>
              val pub = all.filter(_.nspname == "public")
              if (pub.size == 1) pub
              else throw new IllegalArgumentException(
                s"type '$bare' exists in multiple schemas (" +
                  all.map(_.nspname).sorted.mkString(", ") +
                  "); qualify it as schema.type or cast the column to ::text")
          }
      }
      matches.headOption.map(t => resolve(t.oid)).getOrElse(PgSimple(bare))
    }

    /** Column kinds for a relation OID — the live-path resolution: the
      * oid comes from a server-side `'t'::regclass` probe
      * ([[graft.Main.runExport]]), so it names exactly the relation the
      * scan's FROM resolved through the session's search_path. */
    def tableKindsByOid(oid: Long): Option[Seq[(String, PgKind)]] = {
      val cols = attrs.filter(_.relOid == oid).sortBy(_.num)
      if (cols.isEmpty) None
      else Some(cols.map(a => a.name -> resolve(a.typeOid)))
    }

    /** Column name → Kind for `--table t` exports resolved client-side
      * (reference resolves through the prepared statement's column
      * oids, postgres_cloner.rs:316-330; the live path here prefers
      * [[tableKindsByOid]] with a server-side regclass probe, which
      * cannot disagree with the scan). Identifier semantics match the
      * server: unquoted names fold to lowercase,
      * `"Quoted"` names keep case, `schema.table` matches nspname too.
      * An unqualified name present in several schemas prefers `public`
      * (the default search_path tail) and otherwise errors rather than
      * silently converting with another schema's column types. */
    def tableKinds(table: String): Option[Seq[(String, PgKind)]] = {
      val (schema, relname) = parseQualifiedName(table)
      val candidates = schema match {
        case Some(ns) => classes.filter(c => c.nspname == ns && c.relname == relname)
        case None =>
          val all = classes.filter(_.relname == relname)
          if (all.size <= 1) all
          else {
            val pub = all.filter(_.nspname == "public")
            if (pub.size == 1) pub
            else throw new IllegalArgumentException(
              s"table '$relname' exists in multiple schemas (" +
                all.map(_.nspname).sorted.mkString(", ") +
                "); qualify it as schema.table")
          }
      }
      candidates.headOption.map(c =>
        attrs.filter(_.relOid == c.oid).sortBy(_.num)
          .map(a => a.name -> resolve(a.typeOid)))
    }
  }

  /** Split `schema.table` on dots outside double quotes; unquoted
    * segments fold to lowercase (PG identifier folding), quoted segments
    * strip the quotes and keep case (`""` unescapes to `"`). Returns
    * (schema, relname) — schema is the second-to-last segment when the
    * name is qualified (a leading catalog segment, `db.schema.table`,
    * is ignored like PG ignores it for the local database). */
  private[graft] def parseQualifiedName(table: String): (Option[String], String) = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQuotes = false
    table.foreach {
      case '"' => inQuotes = !inQuotes; sb.append('"')
      case '.' if !inQuotes => parts += sb.toString; sb.clear()
      case ch => sb.append(ch)
    }
    parts += sb.toString
    def fold(seg: String): String =
      if (seg.length >= 2 && seg.head == '"' && seg.last == '"')
        seg.substring(1, seg.length - 1).replace("\"\"", "\"")
      else seg.toLowerCase
    if (parts.size == 1) (None, fold(parts.head))
    else (Some(fold(parts(parts.size - 2))), fold(parts.last))
  }

  object PgCatalog {
    /** The introspection queries a live run executes through
      * [[Reader.query]] (pg_catalog is plain SQL — server-side, tiny).
      * Deliberately written in the portable SQL subset (CAST instead
      * of `::`, `= FALSE` instead of a bare boolean) so the SAME
      * strings also run against an embedded engine holding canned
      * catalog tables — JdbcLiveDerbySpec executes this plumbing live
      * without a PG server. */
    val IntrospectionSql: Seq[String] = Seq(
      // typtype is itself the 1-byte "char" type, which the dialect
      // transfers numerically — cast to text so resolve() sees 'e'/'d'/…
      """SELECT t.oid, t.typname, CAST(t.typtype AS varchar(8)) AS typtype,
        |       t.typelem, t.typbasetype, t.typrelid,
        |       COALESCE(r.rngsubtype, 0) AS rngsubtype, n.nspname
        |FROM pg_type t
        |JOIN pg_namespace n ON n.oid = t.typnamespace
        |LEFT JOIN pg_range r ON r.rngtypid = t.oid""".stripMargin,
      "SELECT enumtypid, enumsortorder, enumlabel FROM pg_enum",
      """SELECT attrelid, attnum, attname, atttypid FROM pg_attribute
        |WHERE attnum > 0 AND attisdropped = FALSE""".stripMargin,
      """SELECT c.oid, c.relname, n.nspname
        |FROM pg_class c JOIN pg_namespace n ON n.oid = c.relnamespace
        |WHERE c.relkind IN ('r','v','m','p','f')""".stripMargin)

    /** Load the catalog from a live connection (same rows the canned
      * test fixtures model). Numeric cells are read through [[Number]]
      * — the dialect types pg_attribute.attnum (int2) as ShortType and
      * pg_enum.enumsortorder (float4) as FloatType, so a positional
      * getInt/getDouble would ClassCastException on every live export.
      * pg_class is NOT fetched here: the live `--table` path resolves
      * the relation oid server-side via regclass ([[graft.Main]]), so
      * collecting every relation's row would be pure overhead; the
      * 4th introspection query backs the client-side [[tableKinds]]
      * helper for callers that want name-based resolution. */
    def load(spark: SparkSession, reader: Reader): PgCatalog = {
      def nl(v: Any): Long = v.asInstanceOf[Number].longValue
      def nd(v: Any): Double = v.asInstanceOf[Number].doubleValue
      val Seq(tq, eq, aq, _) = IntrospectionSql
      PgCatalog(
        reader.query(spark, tq).collect().toSeq.map(r => PgTypeRow(
          nl(r.get(0)), r.getString(1), r.getString(2),
          nl(r.get(3)), nl(r.get(4)), nl(r.get(5)), nl(r.get(6)),
          r.getString(7))),
        reader.query(spark, eq).collect().toSeq.map(r =>
          PgEnumRow(nl(r.get(0)), nd(r.get(1)), r.getString(2))),
        reader.query(spark, aq).collect().toSeq.map(r =>
          PgAttributeRow(nl(r.get(0)), nl(r.get(1)).toInt, r.getString(2), nl(r.get(3)))))
    }

    /** The 4th introspection query, for callers that resolve relations
      * client-side by NAME ([[PgCatalog.tableKinds]]). Separate from
      * [[load]] because the live `--table` path resolves the relation
      * oid server-side via regclass instead — fetching every
      * relation's row there would be pure overhead. */
    def loadClasses(spark: SparkSession, reader: Reader): Seq[PgClassRow] = {
      def nl(v: Any): Long = v.asInstanceOf[Number].longValue
      reader.query(spark, IntrospectionSql(3)).collect().toSeq.map(r =>
        PgClassRow(nl(r.get(0)), r.getString(1), r.getString(2)))
    }
  }
}
