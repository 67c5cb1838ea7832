package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata/table access layer.
  *
  * Mirrors the reference's single-statement scan surface
  * (`cli/src/main.rs:297-299` expands `--table T` to `SELECT * FROM T`):
  * here a "table" is one parquet dataset under the scale-factor dir.
  * Reads are plain `spark.read.parquet` so Catalyst can push filters and
  * prune columns into the scan — at 100 TB these tables would be
  * partitioned directories and the same code holds.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** All access goes through the [[sources.Reader]] seam so a JDBC
    * source (sources.JdbcReader + PostgresDialect) drops in without
    * touching any operator (SURVEY §7.2-3). */
  def reader(dir: String): sources.Reader = new sources.ParquetDirReader(dir, names)

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    reader(dir).table(spark, name)

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true`, so ts arrives as a Long
    * of epoch-nanos; normalize to TimestampType at µs precision
    * (floor-truncation, matching DuckDB's ns→µs cast).
    */
  /** The ONE epoch-nanos → µs-timestamp spelling ([[events]] and
    * `graft events`' INT64-ts path both convert through it — two
    * copies of this load-bearing floor could silently drift, review
    * r19.8): integral FLOOR division (DuckDB's ns→µs cast floors:
    * −1 ns → −1 µs, verified) — bare `div` truncates toward zero,
    * which would shift pre-1970 sub-µs timestamps +1 µs off the
    * oracle. Subtracting pmod makes the dividend exactly divisible,
    * all in int64 (epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact
    * range). */
  def nanosTsToMicros(c: String): org.apache.spark.sql.Column =
    timestamp_micros(expr(s"(`$c` - pmod(`$c`, 1000)) div 1000"))

  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", nanosTsToMicros("ts"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
