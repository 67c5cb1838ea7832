package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed source abstraction (SURVEY §7.2-3; O1–O4).
  *
  * The reference's source surface is exactly two shapes —
  * `--table T` (expanded to `SELECT * FROM T`, cli/src/main.rs:297-299)
  * and `--query SQL` (cli/src/postgres_cloner.rs:294-323) — over one
  * PostgreSQL connection. [[Reader]] is that seam: the parquet
  * implementation backs the test corpus, the JDBC implementation
  * carries the same two shapes to a live database with
  * [[PostgresDialect]] supplying the §2.3 type mappings during schema
  * inference (O4). Both return plain DataFrames, so every downstream
  * operator is source-agnostic and Catalyst pushes filters/pruning
  * into whichever scan is active.
  */
trait Reader {

  /** O1: full-table scan. */
  def table(spark: SparkSession, name: String): DataFrame

  /** O2: arbitrary-query scan, executed by the engine that owns the
    * data (PG server-side for JDBC; Catalyst over registered views for
    * parquet). */
  def query(spark: SparkSession, sql: String): DataFrame
}

/** Directory-as-catalog listing shared by the parquet and jsonl dir
  * readers: `(table name, qualified path)` per `<name><suffix>` entry,
  * through the Hadoop FileSystem API so local, `hdfs://` and `s3a://`
  * directories all behave identically (a `java.io.File` listing
  * silently returns nothing for remote schemes). Entries whose
  * basename is not a valid SQL identifier — stray shard files like
  * `part-00000`, in-progress `a.b.tmp` — are skipped rather than
  * allowed to fail view registration. */
private[sources] object DirListing {
  def list(spark: SparkSession, dir: String,
      suffixes: Seq[String]): Seq[(String, String)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    fs.listStatus(path).toSeq.flatMap { st =>
      val n = st.getPath.getName
      suffixes.collectFirst { case s if n.endsWith(s) => n.stripSuffix(s) }
        .filter(_.matches("[A-Za-z_][A-Za-z0-9_]*"))
        .map(t => t -> st.getPath.toString)
    }.sortBy(_._1)
  }

  def exists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** Whole-identifier mention test for the query-scan view filters: a
    * table name must appear as its own word, not as a substring of a
    * longer identifier (`lineitem_old` must not register `lineitem` —
    * for JSONL that false positive costs a full schema-inference scan).
    * `\b` is exact for SQL identifiers since they match `\w+`. */
  def mentions(sql: String, table: String): Boolean =
    java.util.regex.Pattern
      .compile("(?i)\\b" + java.util.regex.Pattern.quote(table) + "\\b")
      .matcher(sql).find()
}

/** Shared shape for self-describing columnar directory layouts (one
  * `<dir>/<name><ext>` per table): `table` is a direct scan; `query`
  * registers views for every entry actually present (known
  * `tableNames` first, then discovered extras) that the SQL text
  * mentions — a directory holding only some tables must not fail
  * registering absent names, and tables the query never references
  * are not touched at all. */
private[sources] abstract class ColumnarDirReader(
    dir: String, tableNames: Seq[String], ext: String) extends Reader {
  protected def read(spark: SparkSession, path: String): DataFrame

  def table(spark: SparkSession, name: String): DataFrame =
    read(spark, s"$dir/$name$ext")

  def query(spark: SparkSession, sql: String): DataFrame = {
    val present = DirListing.list(spark, dir, Seq(ext)).toMap
    (tableNames.filter(present.contains) ++
      (present.keySet -- tableNames).toSeq.sorted)
      .filter(t => DirListing.mentions(sql, t))
      .foreach(t => read(spark, present(t)).createOrReplaceTempView(t))
    spark.sql(sql)
  }
}

/** Parquet-directory reader: one `<dir>/<name>.parquet` per table —
  * the driver's testdata layout. At 100 TB these would be partitioned
  * directories; `spark.read.parquet` handles both identically. */
final class ParquetDirReader(dir: String, tableNames: Seq[String])
    extends ColumnarDirReader(dir, tableNames, ".parquet") {
  protected def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

/** ORC-directory reader (beyond-reference): the other self-describing
  * columnar lake format; Spark ships native ORC support, so schema
  * travels with the files and predicate pushdown / column pruning
  * reach the ORC scan the same way as parquet. */
final class OrcDirReader(dir: String, tableNames: Seq[String])
    extends ColumnarDirReader(dir, tableNames, ".orc") {
  protected def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

/** Shared shape of the text-format dir readers (jsonl/csv): one
  * `<dir>/<name>.<ext>[.gz]` per table, plain-vs-gz ambiguity rejected,
  * and lazy per-query view registration. Only tables the SQL text
  * mentions are registered: schema inference runs a full read at
  * DataFrame-creation time, so eagerly registering a 50-table crawl
  * directory would scan all of it for a one-table query. Note .gz
  * files are not splittable — prefer many shard files (the usual crawl
  * layout), which parallelize per FILE. */
sealed abstract class TextDirReader(dir: String, ext: String)
  extends Reader {

  /** Format-specific load of one table's file. */
  protected def read(spark: SparkSession, name: String, path: String): DataFrame

  def table(spark: SparkSession, name: String): DataFrame = {
    val plain = s"$dir/$name.$ext"
    val gz = s"$plain.gz"
    (DirListing.exists(spark, plain), DirListing.exists(spark, gz)) match {
      case (true, true) => throw new IllegalArgumentException(
        s"both $name.$ext and $name.$ext.gz exist in $dir — " +
          "ambiguous; remove one")
      case (_, true) => read(spark, name, gz)
      case _ => read(spark, name, plain)
    }
  }

  def query(spark: SparkSession, sql: String): DataFrame = {
    // ambiguity (both .ext and .ext.gz) is checked AFTER the mentions
    // filter: tables the query never references are not touched at all
    // (the class contract above), so an unrelated ambiguous pair in the
    // same directory must not fail this query
    val entries = DirListing.list(spark, dir, Seq(s".$ext", s".$ext.gz"))
      .filter { case (t, _) => DirListing.mentions(sql, t) }
    val dups = entries.groupBy(_._1).filter(_._2.size > 1).keys.toSeq.sorted
    if (dups.nonEmpty) throw new IllegalArgumentException(
      s"ambiguous $ext tables in $dir (both .$ext and .$ext.gz): " +
        dups.mkString(", "))
    entries
      .foreach { case (t, p) => read(spark, t, p).createOrReplaceTempView(t) }
    spark.sql(sql)
  }
}

/** JSONL-directory reader (beyond-reference): one
  * `<dir>/<name>.jsonl[.gz]` per table — the raw-crawl ingest format a
  * training-data pipeline starts from before anything is columnar.
  * Schema is inferred from the data by default (an extra read pass);
  * at 100 TB pass `schemas` (keyed BY TABLE — one schema cannot fit a
  * multi-table query) so each scan is single-pass. */
final class JsonlDirReader(
    dir: String,
    schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
  extends TextDirReader(dir, "jsonl") {

  protected def read(spark: SparkSession, name: String, path: String): DataFrame =
    schemas.get(name).fold(spark.read)(s => spark.read.schema(s)).json(path)
}

/** CSV-directory reader (beyond-reference): one `<dir>/<name>.csv[.gz]`
  * per table — the other raw ingest format crawl/export dumps arrive
  * in. Header row expected; schema inferred by default (an extra pass —
  * at 100 TB pass `schemas`, keyed by table, so each scan is
  * single-pass). */
final class CsvDirReader(
    dir: String,
    schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
  extends TextDirReader(dir, "csv") {

  protected def read(spark: SparkSession, name: String, path: String): DataFrame = {
    val r = spark.read.option("header", "true")
    schemas.get(name).fold(r.option("inferSchema", "true"))(s => r.schema(s))
      .csv(path)
  }
}

/** JDBC reader for a live PostgreSQL (O1–O3).
  *
  * Connection options mirror the reference's surface
  * (`cli/src/postgres_cloner.rs:136-292`): url from `--connection` or
  * `DATABASE_URL`/`POSTGRES_URL`, credentials from `PGUSER`/`PGPASSWORD`
  * or the `--user`/`--password` args, TLS via [[JdbcReader.tlsProperties]]
  * (`build_tls_connector`, postgres_cloner.rs:142-186). `fetchsize`
  * keeps the stream row-group-sized like the reference's bounded
  * buffers; [[tablePartitioned]] provides the parallel scan the
  * reference lacks (single-partition default preserves its row order).
  */
final class JdbcReader(
    url: String,
    user: Option[String] = None,
    password: Option[String] = None,
    fetchSize: Int = 10000,
    tlsOptions: Map[String, String] = Map.empty) extends Reader {

  PostgresDialect.register()

  private def base(spark: SparkSession) = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("fetchsize", fetchSize)
    val r1 = user.fold(r)(u => r.option("user", u))
    val r2 = password.fold(r1)(p => r1.option("password", p))
    tlsOptions.foldLeft(r2) {
      case (acc, (k, v)) => acc.option(k, v)
    }
  }

  def table(spark: SparkSession, name: String): DataFrame =
    base(spark).option("dbtable", name).load()

  def query(spark: SparkSession, sql: String): DataFrame =
    base(spark).option("query", sql).load()

  /** Range-partitioned parallel scan — the scale path the single-
    * connection reference cannot offer. `rel` is a table name or a
    * parenthesized-subquery alias (`(SELECT …) AS q`); bounds for the
    * stride come from a server-side MIN/MAX probe, so the caller only
    * names the column and a partition count. Each of the `n` Spark
    * tasks opens its own connection and reads one range slice; row
    * order across slices is NOT the server's single-cursor order (use
    * the default unpartitioned scan when the order contract matters).
    *
    * Spark's JDBC partitioner only accepts numeric/date/timestamp
    * partition columns and parses numeric bounds with `.toLong`, so:
    * columns the dialect transfers as text (numeric, money) get a
    * server-side `::float8` shadow key to stride on (dropped after the
    * load), and fractional bounds are floor/ceil-ed to integer strings. */
  def tablePartitioned(
      spark: SparkSession, rel: String, col: String, n: Int,
      // gates the informational [scan] partition-plan line (the export
      // CLI's --quiet contract: only errors/warnings reach stderr);
      // the non-finite-bounds fallback WARNINGS stay unconditional —
      // they signal degraded behavior
      quiet: Boolean = false): DataFrame = {
    // the single-cursor scan every bail-out path returns — one
    // definition so the fallback cannot diverge between return sites
    def unpartitioned = base(spark).option("dbtable", rel).load()
    if (n <= 1) return unpartitioned
    val schema = unpartitioned.schema // metadata only
    val field = schema.fields.find(_.name.equalsIgnoreCase(col)).getOrElse(
      throw new IllegalArgumentException(
        s"partition column '$col' is not in the scan (columns: ${schema.fieldNames.mkString(", ")})"))
    import org.apache.spark.sql.types._
    val (scanRel, scanCol, probeCol, numericBounds, synthetic) = field.dataType match {
      case _: NumericType => (rel, col, col, true, false)
      case DateType | TimestampType | TimestampNTZType => (rel, col, col, false, false)
      case _ => // text-shaped transfer (numeric/money via the dialect):
        // stride on a float8 shadow of the column, computed server-side
        // ($rel may itself be an aliased subquery, so SELECT *, not t.*).
        // Via ::numeric, which is a no-op for numeric but required for
        // money — PG has no direct money→float8 cast ("cannot cast type
        // money to double precision")
        (s"(SELECT *, ($col)::numeric::float8 AS __graft_part FROM $rel) __graft_p",
          "__graft_part", s"($col)::numeric::float8", true, true)
    }
    // PG keeps its exact ::text probe; other backends get an ANSI
    // spelling (TRIM-of-CHAR — Derby allows integer→CHAR but not
    // →VARCHAR), so the plain numeric/date partitioned path also runs
    // against non-PG JDBC sources and is testable live in-repo (Derby)
    val asText: String => String =
      if (url.startsWith("jdbc:postgresql")) c => s"$c::text"
      else c => s"TRIM(CAST($c AS CHAR(64)))"
    val b = query(spark,
      s"SELECT ${asText(s"MIN($probeCol)")} AS lo, " +
        s"${asText(s"MAX($probeCol)")} AS hi FROM $rel")
      .collect()(0)
    if (b.isNullAt(0) || b.isNullAt(1)) // empty relation / all-NULL column
      return unpartitioned
    val (lo, hi) =
      if (numericBounds)
        // PG float/numeric MIN/MAX can be 'NaN'/'Infinity' (NaN sorts
        // greatest); no finite stride exists then — fall back to the
        // single-cursor scan rather than die in the bound parse
        try (JdbcReader.intBound(b.getString(0), up = false),
          JdbcReader.intBound(b.getString(1), up = true))
        catch { case _: NumberFormatException =>
          System.err.println(s"warning: partition column '$col' has " +
            s"non-finite bounds (${b.getString(0)}, ${b.getString(1)}); " +
            "scanning unpartitioned")
          return unpartitioned
        }
      else {
        // same non-finite hazard for date/timestamp columns: PG MIN/MAX
        // can be 'infinity'/'-infinity' (bitemporal valid_to is commonly
        // 'infinity') or BC-era text ('0001-01-01 BC' from historical
        // data) — Spark's bound parser dies on all of them
        if (Seq(b.getString(0), b.getString(1))
            .exists(v => v == "infinity" || v == "-infinity" ||
              v.endsWith(" BC"))) {
          System.err.println(s"warning: partition column '$col' has " +
            s"non-finite bounds (${b.getString(0)}, ${b.getString(1)}); " +
            "scanning unpartitioned")
          return unpartitioned
        }
        (b.getString(0), b.getString(1))
      }
    // clamping (or a constant column) can collapse the stride entirely;
    // Spark handles lo == hi itself (single whole-table partition), but
    // an explicit unpartitioned scan states the intent and skips the
    // pointless partitioning options
    if (numericBounds && lo.toLong >= hi.toLong)
      return unpartitioned
    // the partition plan, made observable (r16 verdict #6): without
    // this line a mis-strided live export runs silently single-ish —
    // the [scan] prefix pairs with the sink meter's [sink] lines, so
    // an export's read parallelism and write progress read together
    if (!quiet)
      System.err.println(s"[scan] range-partitioned $rel on $col: " +
        s"$n slices, bounds [$lo, $hi]" +
        (if (synthetic) " (synthetic numeric stride key)" else ""))
    val df = base(spark).option("dbtable", scanRel)
      .option("partitionColumn", scanCol)
      .option("numPartitions", n)
      .option("lowerBound", lo)
      .option("upperBound", hi)
      .load()
    if (synthetic) df.drop("__graft_part") else df
  }

  /** pg type name per output column of `sql`, from a JDBC describe
    * (`prepareStatement().getMetaData` — prepared, never executed; the
    * reference reads the same from its prepared statement's columns,
    * postgres_cloner.rs:316-330). Drives the conversion recipes for
    * `--query` exports, where pg_class introspection can't name the
    * output types. */
  def describeQuery(sql: String): Seq[(String, String)] = {
    val props = new java.util.Properties()
    user.foreach(props.setProperty("user", _))
    password.foreach(props.setProperty("password", _))
    tlsOptions.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val md = conn.prepareStatement(sql).getMetaData
      (1 to md.getColumnCount).map(i =>
        md.getColumnLabel(i) -> md.getColumnTypeName(i))
    } finally conn.close()
  }
}

object JdbcReader {
  /** Integer bound for Spark's JDBC range partitioner from a PG
    * `::text` MIN/MAX probe value: floor/ceil fractional bounds to an
    * integer string, and clamp to the Long domain — Spark parses
    * numeric bounds with `.toLong`, and finite float8/numeric values
    * can exceed it (1e30 arrives as '1e+30'). Clamping is safe: JDBC
    * bounds only set the partition STRIDE — rows below the lower bound
    * land in the first slice and rows at/above the upper bound in the
    * last, so no row is dropped. Throws NumberFormatException on
    * NaN/Infinity (callers fall back to an unpartitioned scan). */
  private[sources] def intBound(t: String, up: Boolean): String = {
    val m = if (up) java.math.RoundingMode.CEILING else java.math.RoundingMode.FLOOR
    val bi = new java.math.BigDecimal(t).setScale(0, m).toBigInteger
    bi.max(java.math.BigInteger.valueOf(Long.MinValue))
      .min(java.math.BigInteger.valueOf(Long.MaxValue)).toString
  }

  /** Env-var resolution order matching the reference
    * (postgres_cloner.rs:202-273): explicit arg, then DATABASE_URL,
    * then POSTGRES_URL. */
  def resolveUrl(explicit: Option[String], env: Map[String, String]): Option[String] =
    explicit.orElse(env.get("DATABASE_URL")).orElse(env.get("POSTGRES_URL"))

  /** O3 TLS surface → PostgreSQL JDBC driver properties.
    *
    * Mirrors the reference's `pg_connect` TLS decisions
    * (postgres_cloner.rs:236-292): no --sslmode defaults to `prefer`,
    * or to `require` when a root cert is given (main.rs: "The option
    * implies --sslmode=require"); client cert and key must come
    * together. Mapping notes (documented deviations, pgjdbc semantics):
    * with a root cert, `require` becomes pgjdbc's `verify-ca` — the
    * reference's native-tls verifies the chain in require mode, and
    * pgjdbc's `require` would silently skip verification; pgjdbc takes
    * exactly one root-cert FILE (concatenate PEMs to pass several,
    * where the reference repeats the flag). */
  def tlsProperties(
      sslmode: Option[String],
      sslRootCerts: Seq[String] = Nil,
      sslClientCert: Option[String] = None,
      sslClientKey: Option[String] = None): Map[String, String] = {
    (sslClientCert, sslClientKey) match {
      case (Some(_), None) | (None, Some(_)) =>
        throw new IllegalArgumentException(
          "Options ssl-client-cert and ssl-client-key must both be specified.")
      case _ =>
    }
    sslmode.foreach(m =>
      if (!Set("disable", "prefer", "require").contains(m))
        throw new IllegalArgumentException(
          s"invalid sslmode '$m' (expected disable, prefer or require)"))
    if (sslRootCerts.length > 1)
      throw new IllegalArgumentException(
        "the PostgreSQL JDBC driver accepts a single --ssl-root-cert file; " +
          "concatenate the PEM certificates into one file")
    val mode = sslmode.getOrElse(if (sslRootCerts.nonEmpty) "require" else "prefer")
    val jdbcMode = if (sslRootCerts.nonEmpty && mode == "require") "verify-ca" else mode
    Map("sslmode" -> jdbcMode) ++
      sslRootCerts.headOption.map("sslrootcert" -> _) ++
      sslClientCert.map("sslcert" -> _) ++
      sslClientKey.map("sslkey" -> _)
  }
}
