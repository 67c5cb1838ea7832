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
    case "money" => moneyToDecimal(c)
    case "bytea" => pgBytea(c)
    case "name" | "text" | "xml" | "bpchar" | "varchar" | "citext" | "json" => c
    case "uuid" => uuidToBinary(c)
    case "macaddr" => s.macaddrHandling match {
      case "text" => macaddrText(c)
      case "byte-array" => macaddrBinary(c)
      case "int64" => macaddrInt64(c)
      case other => unsupported(s"macaddr-handling '$other'")
    }
    case "inet" => c
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
    case "halfvec" => halfvecFromText(c) // float32 handling (default)
    case "sparsevec" => sparsevecFromText(c)
    case other => unsupported(s"type '$other'")
  }

  private def unsupported(what: String): Nothing =
    throw new IllegalArgumentException(
      s"unsupported $what — cast the column to ::text in the query as a workaround")
}
