package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JdbcReader

/** The generic-JDBC half of the Reader seam executed against a REAL
  * live database in-repo: Spark ships embedded Derby on the unmanaged
  * classpath, so `JdbcReader.table` / `.query` / `.describeQuery` (the
  * `--query` typing probe — a prepared-statement metadata read, pure
  * JDBC) run here against an actual server engine instead of canned
  * fixtures — and, since [[graft.sources.PgSchema.PgCatalog.IntrospectionSql]]
  * is written in the portable SQL subset, so does the catalog
  * introspection PLUMBING (the exact query strings + the Number-coerced
  * row decode of `PgCatalog.load`/`loadClasses`) against canned
  * pg_catalog tables. What this does NOT cover — and [[LivePgSpec]]
  * does, when a PG server + pgjdbc driver exist — is the real catalog
  * CONTENTS plus everything else PostgreSQL-specific: the regclass
  * probe, the `::text`-cast MIN/MAX probe of `tablePartitioned`, and
  * the §2.3 conversion recipes over live wire text. The two suites
  * together split the seam at exactly the dialect boundary
  * (PostgresDialect.canHandle = jdbc:postgresql only, so Derby scans
  * take Spark's stock mappings).
  */
class JdbcLiveDerbySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // in-memory, per-JVM; Derby's log goes to /tmp, not the repo root
  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withDb[A](f: java.sql.Connection => A): A = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val conn = java.sql.DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  test("JdbcReader scans a live embedded database: table, query, describeQuery") {
    withDb { conn =>
      val st = conn.createStatement()
      try {
        try st.execute("DROP TABLE graft_live_t") catch { case _: Exception => }
        st.execute(
          "CREATE TABLE graft_live_t (id BIGINT NOT NULL, name VARCHAR(20), val DOUBLE)")
        st.execute("INSERT INTO graft_live_t VALUES " +
          "(1, 'alpha', 1.5), (2, NULL, -0.5), (3, 'gamma', 99.25)")
      } finally st.close()

      val reader = new JdbcReader(url)
      // O1 table scan: full read-back through spark.read.jdbc
      val full = reader.table(spark, "graft_live_t")
      assert(full.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "val"))
      val rows = full.orderBy("id").collect()
      assert(rows.length == 3)
      assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha")
      assert(rows(1).isNullAt(1)) // NULL survives the wire
      assert(rows(2).getDouble(2) == 99.25)

      // O2 query scan: server-side SQL, not client-side filtering
      val q = reader.query(spark,
        "SELECT id, val FROM graft_live_t WHERE id > 1")
      assert(q.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))

      // O4 --query typing probe: prepared-statement metadata, never
      // executed — the exact seam runExport uses to type a --query
      val described = reader.describeQuery(
        "SELECT id, name FROM graft_live_t")
      assert(described.map(_._1.toLowerCase) == Seq("id", "name"))
      assert(described.map(_._2.toUpperCase) == Seq("BIGINT", "VARCHAR"))

      // n <= 1 degenerates to the plain scan without a bounds probe
      val single = reader.tablePartitioned(spark, "graft_live_t", "id", 1)
      assert(single.count() == 3)
    }
  }

  test("tablePartitioned: live range scan is sliced, exact, and announces " +
      "its partition plan on stderr (O18 observability)") {
    withDb { conn =>
      val st = conn.createStatement()
      try {
        try st.execute("DROP TABLE graft_live_part") catch { case _: Exception => }
        st.execute(
          "CREATE TABLE graft_live_part (id BIGINT NOT NULL, v VARCHAR(10))")
        (1 to 20).foreach(i =>
          st.execute(s"INSERT INTO graft_live_part VALUES ($i, 'r$i')"))
      } finally st.close()

      val reader = new JdbcReader(url)
      val buf = new java.io.ByteArrayOutputStream()
      val old = System.err
      System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
      val part =
        try reader.tablePartitioned(spark, "graft_live_part", "id", 4)
        finally System.setErr(old)
      // ANSI-CAST bounds probe ran live (MIN=1, MAX=20), 4 range
      // slices, every row exactly once across slices
      assert(part.rdd.getNumPartitions == 4)
      val ids = part.collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (1L to 20L))
      // the partition plan is observable: a mis-strided export is no
      // longer silent
      val err = buf.toString("UTF-8")
      assert(err.contains(
        "[scan] range-partitioned graft_live_part on id: 4 slices, " +
          "bounds [1, 20]"), s"stderr was: $err")
    }
  }

  test("PgCatalog introspection SQL runs live against canned catalog tables") {
    import graft.sources.PgSchema._
    // A realistic pg_catalog slice modeling one user table with enum,
    // array, domain, composite, and range columns, plus rows the WHERE
    // clauses must filter OUT live: a dropped attribute, a system
    // (attnum < 0) attribute, and an index relation. Column types are
    // chosen to exercise the Number-coercion seam of PgCatalog.load —
    // Derby transfers SMALLINT/REAL through different JDBC accessors
    // than PG's int2/float4, so a positional getInt/getDouble would
    // throw here exactly as it would on a live PG export.
    withDb { conn =>
      val st = conn.createStatement()
      try {
        Seq("pg_type", "pg_namespace", "pg_range", "pg_enum",
          "pg_attribute", "pg_class").foreach { t =>
          try st.execute(s"DROP TABLE $t") catch { case _: Exception => }
        }
        st.execute("CREATE TABLE pg_namespace (oid BIGINT, nspname VARCHAR(64))")
        st.execute("""CREATE TABLE pg_type (oid BIGINT, typname VARCHAR(64),
          typtype CHAR(1), typelem BIGINT, typbasetype BIGINT,
          typrelid BIGINT, typnamespace BIGINT)""")
        st.execute("CREATE TABLE pg_range (rngtypid BIGINT, rngsubtype BIGINT)")
        st.execute("""CREATE TABLE pg_enum (enumtypid BIGINT,
          enumsortorder REAL, enumlabel VARCHAR(64))""")
        st.execute("""CREATE TABLE pg_attribute (attrelid BIGINT,
          attnum SMALLINT, attname VARCHAR(64), atttypid BIGINT,
          attisdropped BOOLEAN)""")
        st.execute("""CREATE TABLE pg_class (oid BIGINT, relname VARCHAR(64),
          relnamespace BIGINT, relkind CHAR(1))""")
        st.execute("INSERT INTO pg_namespace VALUES (11, 'pg_catalog'), (2200, 'public')")
        st.execute("""INSERT INTO pg_type VALUES
          (23, 'int4', 'b', 0, 0, 0, 11),
          (25, 'text', 'b', 0, 0, 0, 11),
          (1007, '_int4', 'b', 23, 0, 0, 11),
          (3904, 'int4range', 'r', 0, 0, 0, 11),
          (60000, 'mood', 'e', 0, 0, 0, 2200),
          (60001, 'posint', 'd', 0, 23, 0, 2200),
          (60002, 'pt', 'c', 0, 0, 70002, 2200)""")
        st.execute("INSERT INTO pg_range VALUES (3904, 23)")
        // deliberately out of sortOrder: resolve() must sort, not trust
        // insertion order
        st.execute("""INSERT INTO pg_enum VALUES
          (60000, 2.0, 'sad'), (60000, 1.0, 'happy')""")
        st.execute("""INSERT INTO pg_attribute VALUES
          (70002, 1, 'x', 23, FALSE),
          (70002, 2, 'y', 25, FALSE),
          (70002, 3, 'dead', 25, TRUE),
          (70002, -1, 'ctid', 25, FALSE),
          (70001, 1, 'id', 23, FALSE),
          (70001, 2, 'mood', 60000, FALSE),
          (70001, 3, 'tags', 1007, FALSE),
          (70001, 4, 'pos', 60001, FALSE),
          (70001, 5, 'loc', 60002, FALSE),
          (70001, 6, 'span', 3904, FALSE)""")
        st.execute("""INSERT INTO pg_class VALUES
          (70001, 'events', 2200, 'r'),
          (70002, 'pt', 2200, 'c'),
          (70003, 'events_idx', 2200, 'i')""")
      } finally st.close()

      val reader = new JdbcReader(url)
      val catalog = PgCatalog.load(spark, reader)
        .copy(classes = PgCatalog.loadClasses(spark, reader))

      // enum labels in enumsortorder order, through the REAL coercion
      assert(catalog.resolveName("mood") ==
        PgEnum("mood", Seq("happy", "sad")))
      // the full recursive resolution over the live-loaded rows
      assert(catalog.tableKinds("events") == Some(Seq(
        "id" -> PgSimple("int4"),
        "mood" -> PgEnum("mood", Seq("happy", "sad")),
        "tags" -> PgArray(PgSimple("int4")),
        "pos" -> PgDomain(PgSimple("int4")),
        "loc" -> PgComposite("pt",
          Seq("x" -> PgSimple("int4"), "y" -> PgSimple("text"))),
        "span" -> PgRange(PgSimple("int4")))))
      assert(catalog.tableKindsByOid(70001L) == catalog.tableKinds("events"))
      // WHERE clauses executed server-side: the dropped and system
      // attributes never reach the client …
      assert(!catalog.attrs.exists(a => a.name == "dead" || a.name == "ctid"))
      // … and the relkind filter keeps the index and the composite's
      // backing relation (relkind 'c') out of name resolution
      assert(catalog.classes.map(_.relname) == Seq("events"))
      assert(catalog.tableKinds("events_idx").isEmpty)
    }
  }
}
