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

  test("live: enum / range / composite / array columns export with the exotic recipes") {
    // the t10/t11/t13/t14-shaped conversions against a REAL server —
    // the reference CI exercises exactly these end-to-end
    // (py-tests/test_custom_types.py, test_arrays.py)
    withLive { (url, conn) =>
      exec(conn,
        "DROP SCHEMA IF EXISTS graft_live3 CASCADE",
        "CREATE SCHEMA graft_live3",
        "CREATE TYPE graft_live3.weekday AS ENUM ('monday','tuesday','wednesday')",
        "CREATE TYPE graft_live3.res AS (pdbid text, model int4, chain text)",
        """CREATE TABLE graft_live3.exotic (
          |  id int8 PRIMARY KEY, wd graft_live3.weekday, r int4range,
          |  c graft_live3.res, ta text[])""".stripMargin,
        """INSERT INTO graft_live3.exotic VALUES
          |  (1, 'monday', '[1,5)', ROW('1ehz', 1, 'A'), ARRAY['a','b']),
          |  (2, NULL, 'empty', '(,,)', ARRAY[]::text[]),
          |  (3, 'wednesday', '(,10]', NULL,
          |   ARRAY[NULL, 'x,y', '']::text[])""".stripMargin)
      val out = java.nio.file.Files.createTempDirectory("livepg").toString + "/exotic"
      val stats = Main.runExport(spark,
        Main.Args(outputFile = out, table = Some("graft_live3.exotic"),
          connection = Some(url), quiet = true),
        env = Map.empty)
      assert(stats.rows == 3)
      val back = spark.read.parquet(out).orderBy("id").collect()
      // T25 enum → text identity
      assert(back(0).getAs[String]("wd") == "monday")
      assert(back(1).isNullAt(back(1).fieldIndex("wd")))
      // T27 range → struct: [1,5) bounds; 'empty' → all-NULL bounds +
      // is_empty; '(,10]' → NULL lower, inclusive upper
      val r1 = back(0).getStruct(back(0).fieldIndex("r"))
      assert(r1.getAs[Int]("lower") == 1 && r1.getAs[Int]("upper") == 5)
      assert(r1.getAs[Boolean]("lower_inclusive") &&
        !r1.getAs[Boolean]("upper_inclusive") && !r1.getAs[Boolean]("is_empty"))
      val r2 = back(1).getStruct(back(1).fieldIndex("r"))
      assert(r2.isNullAt(r2.fieldIndex("lower")) && r2.getAs[Boolean]("is_empty"))
      val r3 = back(2).getStruct(back(2).fieldIndex("r"))
      assert(r3.isNullAt(r3.fieldIndex("lower")) &&
        r3.getAs[Int]("upper") == 10 && r3.getAs[Boolean]("upper_inclusive"))
      // T28 composite → struct: all-NULL-fields record '(,,)' must stay
      // a NON-NULL struct, distinct from SQL NULL (row 3)
      val c1 = back(0).getStruct(back(0).fieldIndex("c"))
      assert(c1.getAs[String]("pdbid") == "1ehz" && c1.getAs[Int]("model") == 1)
      val c2 = back(1).getStruct(back(1).fieldIndex("c"))
      assert(c2 != null && c2.isNullAt(c2.fieldIndex("pdbid")))
      assert(back(2).isNullAt(back(2).fieldIndex("c")))
      // T30 1-D array: empty ≠ NULL; NULL element and embedded comma
      // survive the array grammar
      assert(back(0).getSeq[String](back(0).fieldIndex("ta")) == Seq("a", "b"))
      assert(back(1).getSeq[String](back(1).fieldIndex("ta")).isEmpty)
      assert(back(2).getSeq[String](back(2).fieldIndex("ta")) ==
        Seq(null, "x,y", ""))
      exec(conn, "DROP SCHEMA graft_live3 CASCADE")
    }
  }

  test("live: pgvector vector and sparsevec export (cancels without the extension)") {
    withLive { (url, conn) =>
      try exec(conn, "CREATE EXTENSION IF NOT EXISTS vector")
      catch { case e: Throwable =>
        cancel(s"pgvector extension not installable on this server ($e)") }
      exec(conn,
        "DROP TABLE IF EXISTS graft_live_vec",
        """CREATE TABLE graft_live_vec (
          |  id int8 PRIMARY KEY, v vector(3), s sparsevec(10))""".stripMargin,
        """INSERT INTO graft_live_vec VALUES
          |  (1, '[1,2,3]', '{1:-1.0,5:5.25}/10'),
          |  (2, NULL, '{}/10'),
          |  (3, '[0.5,-0.25,3.75]', NULL)""".stripMargin)
      val out = java.nio.file.Files.createTempDirectory("livepg").toString + "/vec"
      val stats = Main.runExport(spark,
        Main.Args(outputFile = out, table = Some("graft_live_vec"),
          connection = Some(url), quiet = true),
        env = Map.empty)
      assert(stats.rows == 3)
      val back = spark.read.parquet(out).orderBy("id").collect()
      // T32 vector → array<float>
      assert(back(0).getSeq[Float](back(0).fieldIndex("v")) == Seq(1f, 2f, 3f))
      assert(back(1).isNullAt(back(1).fieldIndex("v")))
      assert(back(2).getSeq[Float](back(2).fieldIndex("v")) ==
        Seq(0.5f, -0.25f, 3.75f))
      // T34 sparsevec → map (1-based indices); empty map ≠ NULL
      assert(back(0).getMap[Int, Float](back(0).fieldIndex("s")) ==
        Map(1 -> -1.0f, 5 -> 5.25f))
      assert(back(1).getMap[Int, Float](back(1).fieldIndex("s")).isEmpty)
      assert(back(2).isNullAt(back(2).fieldIndex("s")))
      exec(conn, "DROP TABLE graft_live_vec")
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

  test("live: tablePartitioned handles money columns and infinity timestamps") {
    withLive { (url, conn) =>
      val reader = new JdbcReader(url)
      // money strides through its ::numeric::float8 shadow key — PG has
      // no direct money→float8 cast, so the plain ::float8 form would
      // fail the server-side probe outright
      exec(conn,
        "DROP TABLE IF EXISTS graft_live_money",
        """CREATE TABLE graft_live_money AS
          |SELECT g AS id, (g * 1.5)::numeric::money AS amount
          |FROM generate_series(1, 100) g""".stripMargin)
      val m = reader.tablePartitioned(spark, "graft_live_money", "amount", 4)
      assert(m.count() == 100)
      assert(!m.columns.contains("__graft_part")) // shadow key dropped
      // 'infinity'::timestamptz bounds (bitemporal valid_to) have no
      // finite stride — the scan must fall back, not die in Spark's
      // bound parser
      exec(conn,
        "DROP TABLE IF EXISTS graft_live_inf",
        """CREATE TABLE graft_live_inf AS
          |SELECT g AS id,
          |  CASE WHEN g = 1 THEN 'infinity'::timestamptz
          |       ELSE now() END AS valid_to
          |FROM generate_series(1, 50) g""".stripMargin)
      val inf = reader.tablePartitioned(spark, "graft_live_inf", "valid_to", 4)
      assert(inf.count() == 50)
      exec(conn,
        "DROP TABLE graft_live_money",
        "DROP TABLE graft_live_inf")
    }
  }
}
