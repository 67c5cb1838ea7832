package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One named query: the Spark-native implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver uses
  * as independent ground truth. `sql = None` → driver records a weaker
  * rows-only check (used for ops whose semantics aren't SQL-expressible,
  * e.g. LSH bucketing with engine-specific hashes).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String],
    headline: Boolean = false)

object QueryDef {
  /** Helpers shared by all query suites to keep Spark results and DuckDB
    * oracle results bit-identical:
    *
    * Floating-point SUMs are order-dependent, and Spark's partial
    * aggregation order differs from DuckDB's single-threaded order — so
    * any `sum(double)` would hash-mismatch in the last bits. All money/
    * quantity aggregates therefore go through DECIMAL(38,10): the
    * double→decimal cast is value-deterministic, decimal addition is
    * exact and associative (order-independent), and the final
    * decimal→double cast is round-to-nearest in both engines. Per-row
    * double arithmetic (`price * (1-disc)`) is plain IEEE754 binary64 in
    * both engines and needs no such treatment.
    */
  def dec(c: Column): Column = c.cast(DecimalType(38, 10))

  /** Exact, order-independent sum of a double column, returned as double.
    *
    * The sum is first re-scaled to DECIMAL(27,4): at scale 4 with sums
    * < ~9e11 the unscaled value fits in 2^53, so the final decimal→double
    * cast is exactly rounded in both engines. The scale-10→4 step itself
    * is NOT cast-equivalent across engines (Spark's decimal downcast
    * rounds HALF_UP, DuckDB's cast truncates), so the SQL twin rounds
    * explicitly: DuckDB ROUND is half-away-from-zero, which matches
    * Spark's HALF_UP at every magnitude.
    */
  def dsum(c: Column): Column =
    sum(dec(c)).cast(DecimalType(27, 4)).cast(DoubleType)
  /** SQL-side twin of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(CAST(ROUND(SUM(CAST(($expr) AS DECIMAL(38,10))), 4) AS DECIMAL(27,4)) AS DOUBLE)"
  /** [[dsumSql]] as a WINDOWED sum — the same exact-decimal /
    * ROUND-4 / double chain over an OVER frame (rolling aggregates
    * must be order-free for the same reason grouped ones are). */
  def dwinSql(expr: String, win: String): String =
    s"CAST(CAST(ROUND(SUM(CAST(($expr) AS DECIMAL(38,10))) OVER ($win), 4) AS DECIMAL(27,4)) AS DOUBLE)"
  /** Exact mean: decimal sum cast to double, then double division. */
  def davg(c: Column): Column = (dsum(c) / count(lit(1)))
  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / COUNT(*))"

  /** Driver-safe canonical encodings.
    *
    * The driver's comparator loads both sides into pandas, row-sorts with
    * `sort_values` over every column, and hashes cells type-aware. That
    * crashes on unhashable cells — dicts (struct/map), lists/ndarrays
    * (arrays), bytearrays (binary) — and mismatches Decimal-vs-float64
    * (pandas reads parquet decimals as `decimal.Decimal`; DuckDB's .df()
    * renders them float64). CORRECTNESS_r03 lost 15 otherwise-correct
    * queries to exactly this. So: a query registered with an oracle must
    * emit only string / int / double / boolean / date / timestamp
    * columns. Nested and binary values are still BUILT inside the query
    * (and schema-asserted through the parquet sink in the ScalaTest
    * suites); these helpers encode them as deterministic strings for the
    * final driver-visible projection. Binary → `hex(...)`; decimal →
    * `.cast(StringType)` (both engines print full scale digits).
    */
  /** Injective element encoding (ADVICE r04: the old bare cast made
    * "x,y" indistinguishable from two tokens and the string "NULL" from
    * a SQL NULL): elements containing `, [ ] { } " \`, equal to "NULL",
    * or empty are PG-style quoted with `\"`/`\\` escapes; SQL NULL stays
    * the bare NULL token. Oracle literals use the same quoting. */
  def canonElem(e: Column): Column = canonElem(e, "[,\\[\\]{}\"\\\\]")

  private def canonElem(e: Column, trigger: String): Column = {
    val s = e.cast(StringType)
    val quoted = concat(lit("\""),
      regexp_replace(regexp_replace(s, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      lit("\""))
    when(e.isNull, lit("NULL"))
      .when(s === "NULL" || s === "" || s.rlike(trigger), quoted)
      .otherwise(s)
  }

  /** Array → "[a,b,NULL]" (NULL array → NULL ≠ "[]" ≠ "[NULL]"). The
    * element encoder defaults to a string cast; pass a custom one for
    * struct elements (an encoder returning NULL for a NULL element
    * renders as the "NULL" token). */
  def canonArray(c: Column, enc: Column => Column = canonElem): Column =
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(concat(lit("["),
        array_join(transform(c, e => coalesce(enc(e), lit("NULL"))), ","),
        lit("]")))

  /** Map → "{k:v,…}" sorted by key (NULL map → NULL ≠ "{}"). BOTH key
    * and value encode through [[canonElem]] with ':' added to the
    * quote-trigger class — the old bare-cast key (and ':'-less value
    * trigger) let distinct maps collide: map("k:a"→"b") and
    * map("k"→"a:b") both rendered "{k:a:b}". Keys/values without
    * special characters encode exactly as before, so oracle twins'
    * plain `k || ':' || v` aggregation stays valid for such data. */
  def canonMap(c: Column): Column = {
    val mapTrigger = "[,:\\[\\]{}\"\\\\]"
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(concat(lit("{"),
        array_join(transform(sort_array(map_entries(c)),
          e => concat(canonElem(e.getField("key"), mapTrigger), lit(":"),
            canonElem(e.getField("value"), mapTrigger))), ","), lit("}")))
  }
}
