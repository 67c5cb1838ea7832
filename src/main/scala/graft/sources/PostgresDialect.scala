package graft.sources

import java.sql.Types
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types._

/** O4: PostgreSQL schema inference — pg type names → Catalyst types,
  * mirroring the reference's `map_simple_type`
  * (`cli/src/postgres_cloner.rs:578-699`) through Spark's public
  * `JdbcDialect` extension point (SURVEY §4.1: the cleaner alternative
  * to a custom Rule).
  *
  * Types the generic JDBC path would mis-map or reject are pinned here;
  * exotic transfers (range/composite/vector) arrive as text — the pg
  * JDBC driver's `OTHER`-type string form — and are decoded by the
  * expression layer in [[graft.functions.PgConversions]], which is the
  * same two-phase shape as the reference (wire value → conversion
  * closure).
  */
object PostgresDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:postgresql")

  /** typeName is the pg_type name the driver reports (lowercase). */
  override def getCatalystType(
      sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] = typeName match {
    // T2/T3/T5: exact integer widths (postgres_cloner.rs:587-590)
    case "int2" => Some(ShortType)
    case "int4" => Some(IntegerType)
    case "int8" => Some(LongType)
    // T4: oid is unsigned 32-bit → widen (myfrom.rs:38-42)
    case "oid" => Some(LongType)
    // T6: floats (postgres_cloner.rs:591-592)
    case "float4" => Some(FloatType)
    case "float8" => Some(DoubleType)
    // T7-T9: numeric transfers as text — pgjdbc's getBigDecimal throws
    // on PG's 'NaN' before any conversion could run, and text keeps the
    // full precision for the p>38 byte encoding; the recipe layer
    // applies --numeric-handling (NaN→NULL like datatypes/numeric.rs:19)
    case "numeric" => Some(StringType)
    // T10: money transfers as text — pgjdbc's decimal/double getters
    // choke on the currency symbol and group separators; the recipe
    // parses `$1,234.56` → Decimal(18,2) (datatypes/money.rs:6-26)
    case "money" => Some(StringType)
    // T12: bytea (postgres_cloner.rs:598)
    case "bytea" => Some(BinaryType)
    // T13/T14/T21/T22/T25: text-shaped transfers
    case "name" | "text" | "xml" | "bpchar" | "varchar" | "citext" |
         "json" | "jsonb" | "inet" | "cidr" | "macaddr" | "macaddr8" |
         "bit" | "varbit" | "uuid" | "interval" =>
      Some(StringType)
    // T15/T16/T17: temporal (postgres_cloner.rs:608-613)
    case "timestamptz" => Some(TimestampType)
    case "timestamp" => Some(TimestampNTZType)
    case "date" => Some(DateType)
    // T18: no TimeType in Spark → time becomes micros Long downstream;
    // timetz stays text (no Spark type carries the offset)
    case "time" | "timetz" => Some(StringType)
    // T32-T34: pgvector family arrives as its text form
    case "vector" | "halfvec" | "sparsevec" => Some(StringType)
    // T30/T31: array types (pg names them _elem) transfer as text and
    // are parsed by the recipe layer per --array-handling; Spark's
    // generic JDBC fallback has no ARRAY mapping, so without this a
    // live array scan would throw
    case n if n.startsWith("_") => Some(StringType)
    case _ => sqlType match {
      // range/composite/enum/domain: pg JDBC reports OTHER; take text
      // and decode with PgConversions (T25-T31)
      case Types.OTHER => Some(StringType)
      case _ => None // generic JDBC mapping is already correct
    }
  }

  /** Quote identifiers the PG way (double quotes). */
  override def quoteIdentifier(colName: String): String =
    "\"" + colName.replace("\"", "\"\"") + "\""

  @volatile private var registered = false
  def register(): Unit = synchronized {
    if (!registered) { JdbcDialects.registerDialect(this); registered = true }
  }
}
