package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.PgConversions._

/** The reference's `map_simple_type` dispatch
  * (`cli/src/postgres_cloner.rs:578-699`): pg type name + the run's
  * [[PgConversions.PgSettings]] → the conversion Column. This is what
  * [[graft.Main]]'s export path applies per column after a
  * [[graft.sources.PostgresDialect]]-typed scan, closing the loop
  * settings → schema → conversion exactly like the reference's
  * `SchemaSettings` → appender-tree construction.
  */
object PgTypeMapper {

  /** Convert one column of PG-text-form values per the settings.
    * Unknown types raise, naming the type — the reference's T35 policy
    * (`postgres_cloner.rs:655,696-697`: explicit error, workaround is
    * `::text` in the query). */
  def convert(typeName: String, c: Column, s: PgSettings): Column = typeName match {
    case "bool" => pgBool(c)
    case "int2" => pgInt2(c)
    case "int4" => pgInt4(c)
    case "int8" => pgInt8(c)
    case "oid" => pgOid(c)
    // the pg_type name is bare `char` (catalog/describe path, text form);
    // the quoted spelling and char1 take the numeric wire form
    case "char" => pgCharFromText(c)
    case "\"char\"" | "char1" => pgCharByte(c)
    case "float4" => pgFloat4(c)
    case "float8" => pgFloat8(c)
    case "numeric" => s.numericHandling match {
      case "decimal" =>
        if (s.decimalPrecision > 38)
          numericToBigDecimalBytes(c, s.decimalPrecision, s.decimalScale)
        else numericToDecimal(c, s.decimalPrecision, s.decimalScale)
      case "double" => numericToDouble(c)
      case "float32" => numericToFloat(c)
      case "string" => numericToString(c)
      case other => unsupported(s"numeric-handling '$other'")
    }
    // the recipe path always carries the text form; the int64-cents wire
    // form is decoded by moneyToDecimal on the fixture path (t05)
    case "money" => moneyFromText(c)
    case "bytea" => pgBytea(c)
    case "name" | "text" | "xml" | "bpchar" | "varchar" | "citext" => c
    // T14: on the text/JDBC transfer both json and jsonb arrive as plain
    // JSON text with no version header (the wire-format header case is
    // [[PgConversions.jsonbStripHeader]]); both handlings keep the text —
    // the reference's TextMarkedAsJson only differs in the parquet JSON
    // logical annotation, which Spark's writer cannot emit (documented
    // deviation, SURVEY §7.4; reference: postgres_cloner.rs:603-607,
    // datatypes/jsonb.rs:17-24).
    case "json" | "jsonb" => s.jsonHandling match {
      case "text" | "text-marked-json" => c
      case other => unsupported(s"json-handling '$other'")
    }
    case "uuid" => uuidToBinary(c)
    case "macaddr" => s.macaddrHandling match {
      case "text" => macaddrText(c)
      case "byte-array" => macaddrBinary(c)
      case "int64" => macaddrInt64(c)
      case other => unsupported(s"macaddr-handling '$other'")
    }
    // cidr/macaddr8/timetz pass through as their canonical pg text form
    // (beyond reference — it TODO-lists all three as unsupported,
    // postgres_cloner.rs:655)
    case "inet" | "cidr" | "macaddr8" | "timetz" => c
    case "bit" | "varbit" => pgBits(c)
    case "date" => pgDate(c)
    case "time" => pgTimeMicros(c)
    case "timestamp" => pgTimestamp(c)
    case "timestamptz" => pgTimestampTz(c)
    case "interval" => s.intervalHandling match {
      case "interval" => intervalToBytes(c)
      case "struct" => intervalToStruct(c)
      case other => unsupported(s"interval-handling '$other'")
    }
    case "vector" => vectorFromText(c)
    // T33: values pass through f16 precision in both handlings
    // (postgres_cloner.rs:660-666); 'float16' additionally stores
    // FLBA(2)+FLOAT16, which Spark's writer can't emit — the export
    // path transcodes the written file's float leaves post-write
    // ([[graft.sources.ParquetTranscode]], PgSchema.float16LeafFor).
    case "halfvec" => s.float16Handling match {
      case "float32" | "float16" => halfvecFromText(c)
      case other => unsupported(s"float16-handling '$other'")
    }
    case "sparsevec" => sparsevecFromText(c)
    case other => unsupported(s"type '$other'")
  }

  private def unsupported(what: String): Nothing =
    throw new IllegalArgumentException(
      s"unsupported $what — cast the column to ::text in the query as a workaround")
}
