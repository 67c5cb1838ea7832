package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{JdbcReader, PgSchema}

/** Live-PostgreSQL integration harness — the one seam unit tests drive
  * only through canned catalogs (`PgSchemaSpec`), exercised here against
  * a real server when one is provided (reference CI shape:
  * `.github/workflows/test.yaml:15-46`, PG 12–17).
  *
  * Opt-in: set `GRAFT_PG_URL` to a full JDBC URL, e.g.
  * `jdbc:postgresql://localhost:5432/postgres?user=postgres&password=pg`,
  * with the pgjdbc driver on the test classpath. When the variable is
  * unset (the default sandbox), every test CANCELS — the suite stays
  * green without a server; it never silently passes work it didn't do.
  */
class LivePgSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Connect or cancel: unset env → skip; set-but-unreachable (or no
    * pgjdbc on the classpath) → skip with the reason in the report. */
  private def withLive[A](f: (String, java.sql.Connection) => A): A = {
    val url = sys.env.getOrElse("GRAFT_PG_URL",
      cancel("GRAFT_PG_URL not set — live-PG suite skipped"))
    val conn =
      try java.sql.DriverManager.getConnection(url)
      catch { case e: Throwable =>
        cancel(s"GRAFT_PG_URL set but not connectable ($e)") }
    try f(url, conn) finally conn.close()
  }

  private def exec(c: java.sql.Connection, sql: String*): Unit =
    sql.foreach { s => val st = c.createStatement(); try st.execute(s) finally st.close() }

  test("live: t01-shaped table export round-trips through runExport") {
    withLive { (url, conn) =>
      exec(conn,
        "DROP SCHEMA IF EXISTS graft_live CASCADE",
        "CREATE SCHEMA graft_live",
        """CREATE TABLE graft_live.t01 (
          |  id int8 PRIMARY KEY, b bool, i2 int2, i4 int4, f8 float8,
          |  s text, n numeric(10,2), ts timestamptz)""".stripMargin,
        """INSERT INTO graft_live.t01 VALUES
          |  (1, true, 2, 3, 4.5, 'alpha', 12.34, '2024-01-02T03:04:05Z'),
          |  (2, false, NULL, NULL, 'NaN'::float8, NULL, NULL, NULL),
          |  (3, NULL, -32768, 2147483647, -0.0, '', 99999999.99,
          |   '1969-12-31T23:59:59Z')""".stripMargin)
      val out = java.nio.file.Files.createTempDirectory("livepg").toString + "/t01"
      val stats = Main.runExport(spark,
        Main.Args(outputFile = out, table = Some("graft_live.t01"),
          connection = Some(url), quiet = true),
        env = Map.empty)
      assert(stats.rows == 3)
      val back = spark.read.parquet(out).orderBy("id").collect()
      assert(back.length == 3)
      assert(back(0).getAs[Boolean]("b") && back(0).getAs[String]("s") == "alpha")
      assert(back(1).isNullAt(back(1).fieldIndex("s")))
      // numeric NaN → NULL (T7); float8 NaN survives as Double.NaN (T6)
      assert(back(1).getAs[Double]("f8").isNaN)
      assert(back(1).isNullAt(back(1).fieldIndex("n")))
      exec(conn, "DROP SCHEMA graft_live CASCADE")
    }
  }

  test("live: PgCatalog.load resolves enum / domain / composite kinds") {
    withLive { (url, conn) =>
      exec(conn,
        "DROP SCHEMA IF EXISTS graft_live2 CASCADE",
        "CREATE SCHEMA graft_live2",
        "CREATE TYPE graft_live2.mood AS ENUM ('sad','ok','happy')",
        "CREATE DOMAIN graft_live2.posint AS int4 CHECK (VALUE > 0)",
        "CREATE TYPE graft_live2.pt AS (x float8, y float8)",
        """CREATE TABLE graft_live2.typed (
          |  id int8, m graft_live2.mood, p graft_live2.posint,
          |  c graft_live2.pt, ms graft_live2.mood[])""".stripMargin)
      val reader = new JdbcReader(url)
      val catalog = PgSchema.PgCatalog.load(spark, reader)
      // the live path: a server-side regclass probe names the relation
      // exactly as the scan's FROM would resolve it (Main.runExport)
      val oid = reader.query(spark,
        "SELECT 'graft_live2.typed'::regclass::oid::int8 AS o")
        .collect()(0).getLong(0)
      val kinds = catalog.tableKindsByOid(oid)
        .getOrElse(fail("live catalog did not resolve graft_live2.typed"))
        .toMap
      assert(kinds("m") ==
        PgSchema.PgEnum("mood", Seq("sad", "ok", "happy")))
      assert(kinds("p") == PgSchema.PgDomain(PgSchema.PgSimple("int4")))
      assert(kinds("c") == PgSchema.PgComposite("pt", Seq(
        "x" -> PgSchema.PgSimple("float8"),
        "y" -> PgSchema.PgSimple("float8"))))
      assert(kinds("ms") == PgSchema.PgArray(
        PgSchema.PgEnum("mood", Seq("sad", "ok", "happy"))))
      exec(conn, "DROP SCHEMA graft_live2 CASCADE")
    }
  }

  test("live: describeQuery types a --query export from the prepared statement") {
    withLive { (url, _) =>
      val reader = new JdbcReader(url)
      val described = reader.describeQuery(
        "SELECT 1::int8 AS a, 'x'::text AS b, 2.5::numeric(5,2) AS c")
      assert(described == Seq("a" -> "int8", "b" -> "text", "c" -> "numeric"))
    }
  }

  test("live: tablePartitioned range scan returns every row exactly once") {
    withLive { (url, conn) =>
      exec(conn,
        "DROP TABLE IF EXISTS graft_live_part",
        "CREATE TABLE graft_live_part AS SELECT g AS id, g * 2 AS v FROM generate_series(1, 1000) g")
      val reader = new JdbcReader(url)
      val part = reader.tablePartitioned(spark, "graft_live_part", "id", 4)
      assert(part.count() == 1000)
      assert(part.rdd.getNumPartitions == 4)
      assert(part.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) == 500500L)
      exec(conn, "DROP TABLE graft_live_part")
    }
  }
}
