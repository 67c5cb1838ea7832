package graft

import org.apache.spark.sql.SparkSession
import graft.sources.{JdbcReader, ParquetDirReader, ParquetSink, Reader}
import graft.functions.PgConversions.PgSettings

/** CLI shell mirroring the reference's argument surface
  * (`cli/src/main.rs:48-184`: `export --table T | --query Q -o FILE`
  * plus connection and handling options; env fallbacks
  * `postgres_cloner.rs:202-273`).
  *
  * The source is either a live PostgreSQL (`--connection jdbc:...`,
  * `DATABASE_URL`/`POSTGRES_URL` env) or a parquet directory
  * (`--connection dir:/path`) — both behind [[sources.Reader]], so the
  * export path is identical. Exactly-one-of table/query is enforced
  * with the reference's error wording (`main.rs:252-260`).
  */
object Main {

  final case class Args(
      outputFile: String = "",
      table: Option[String] = None,
      query: Option[String] = None,
      connection: Option[String] = None,
      host: Option[String] = None,
      port: Option[Int] = None,
      user: Option[String] = None,
      dbname: Option[String] = None,
      compression: String = "zstd",
      compressionLevel: Option[Int] = None,
      quiet: Boolean = false,
      settings: PgSettings = PgSettings())

  /** Pure parser — unit-testable; throws IllegalArgumentException with
    * user-facing messages. */
  private[graft] def parseArgs(argv: Seq[String], env: Map[String, String]): Args = {
    if (argv.isEmpty || argv.head != "export")
      throw new IllegalArgumentException("usage: export [OPTIONS] --output-file FILE (--table T | --query SQL)")
    var a = Args()
    var rest = argv.tail.toList
    def take(flag: String): String = rest match {
      case v :: tl if !v.startsWith("--") => rest = tl; v
      case _ => throw new IllegalArgumentException(s"missing value for $flag")
    }
    while (rest.nonEmpty) {
      val flag = rest.head; rest = rest.tail
      flag match {
        case "--output-file" | "-o" => a = a.copy(outputFile = take(flag))
        case "--table" | "-t" => a = a.copy(table = Some(take(flag)))
        case "--query" | "-q" => a = a.copy(query = Some(take(flag)))
        case "--connection" => a = a.copy(connection = Some(take(flag)))
        case "--host" | "-H" => a = a.copy(host = Some(take(flag)))
        case "--port" | "-p" => a = a.copy(port = Some(take(flag).toInt))
        case "--user" | "-U" => a = a.copy(user = Some(take(flag)))
        case "--dbname" | "-d" => a = a.copy(dbname = Some(take(flag)))
        case "--compression" => a = a.copy(compression = take(flag))
        case "--compression-level" => a = a.copy(compressionLevel = Some(take(flag).toInt))
        case "--quiet" => a = a.copy(quiet = true)
        case "--numeric-handling" =>
          a = a.copy(settings = a.settings.copy(numericHandling = take(flag)))
        case "--decimal-precision" =>
          a = a.copy(settings = a.settings.copy(decimalPrecision = take(flag).toInt))
        case "--decimal-scale" =>
          a = a.copy(settings = a.settings.copy(decimalScale = take(flag).toInt))
        case "--enum-handling" =>
          a = a.copy(settings = a.settings.copy(enumHandling = take(flag)))
        case "--interval-handling" =>
          a = a.copy(settings = a.settings.copy(intervalHandling = take(flag)))
        case "--macaddr-handling" =>
          a = a.copy(settings = a.settings.copy(macaddrHandling = take(flag)))
        case "--array-handling" =>
          a = a.copy(settings = a.settings.copy(arrayHandling = take(flag)))
        case "--json-handling" =>
          a = a.copy(settings = a.settings.copy(jsonHandling = take(flag)))
        case "--float16-handling" =>
          a = a.copy(settings = a.settings.copy(float16Handling = take(flag)))
        case other =>
          throw new IllegalArgumentException(s"unknown option '$other'")
      }
    }
    if (a.outputFile.isEmpty)
      throw new IllegalArgumentException("--output-file is required")
    (a.table, a.query) match {
      case (Some(_), Some(_)) =>
        throw new IllegalArgumentException("either --table or --query must be specified, but not both")
      case (None, None) =>
        throw new IllegalArgumentException("either --table or --query must be specified")
      case _ =>
    }
    // --connection and discrete args are mutually exclusive
    // (reference conflict rule, cli/src/main.rs:119-131)
    if (a.connection.isDefined &&
        (a.host.isDefined || a.port.isDefined || a.dbname.isDefined))
      throw new IllegalArgumentException(
        "--connection cannot be combined with --host/--port/--dbname")
    ParquetSink.codecFor(a.compression) // validate early
    a
  }

  /** Discrete args → jdbc url (postgres_cloner.rs:222-273 parity). */
  private[graft] def discreteUrl(a: Args): Option[String] =
    a.host.map(h =>
      s"jdbc:postgresql://$h:${a.port.getOrElse(5432)}/${a.dbname.getOrElse("postgres")}")

  private[graft] def readerFor(a: Args, env: Map[String, String]): Reader = {
    val conn = JdbcReader.resolveUrl(a.connection.orElse(discreteUrl(a)), env)
      .getOrElse(throw new IllegalArgumentException(
        "no connection: pass --connection or --host, or set DATABASE_URL / POSTGRES_URL"))
    if (conn.startsWith("dir:"))
      new ParquetDirReader(conn.stripPrefix("dir:"), Tables.names)
    else if (conn.startsWith("jdbc:"))
      new JdbcReader(conn, a.user.orElse(env.get("PGUSER")), env.get("PGPASSWORD"))
    else throw new IllegalArgumentException(
      s"unsupported connection '$conn' (expected jdbc:postgresql://... or dir:/path)")
  }

  /** The export pipeline: read (table or query) → single ordered
    * parquet file. Order preservation is the reference's implicit
    * contract (py-tests export `ORDER BY` queries and assert row order,
    * wrappers.py:117-118): the sink's coalesce(1) concatenates
    * partitions in order, so a sorted query stays sorted in the file
    * (SURVEY §7.5-4). Separated from main() so tests drive it with a
    * shared session. */
  private[graft] def runExport(spark: SparkSession, a: Args,
      env: Map[String, String]): ParquetSink.WriteStats = {
    val reader = readerFor(a, env)
    val df = a.table.map(reader.table(spark, _))
      .getOrElse(reader.query(spark, a.query.get))
    val stats = ParquetSink.write(df, a.outputFile,
      ParquetSink.SinkOptions(
        compression = a.compression,
        compressionLevel = a.compressionLevel,
        quiet = a.quiet))
    if (!a.quiet)
      System.err.println(s"exported ${stats.rows} rows to ${a.outputFile}")
    stats
  }

  def main(argv: Array[String]): Unit = {
    val a =
      try parseArgs(argv.toSeq, sys.env)
      catch { case e: IllegalArgumentException =>
        System.err.println(s"error: ${e.getMessage}"); sys.exit(2)
      }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-export")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try runExport(spark, a, sys.env)
    finally spark.stop()
  }
}
