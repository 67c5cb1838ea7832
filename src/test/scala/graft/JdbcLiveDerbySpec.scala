package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JdbcReader

/** The generic-JDBC half of the Reader seam executed against a REAL
  * live database in-repo: Spark ships embedded Derby on the unmanaged
  * classpath, so `JdbcReader.table` / `.query` / `.describeQuery` (the
  * `--query` typing probe — a prepared-statement metadata read, pure
  * JDBC) run here against an actual server engine instead of canned
  * fixtures. What this does NOT cover — and [[LivePgSpec]] does, when a
  * PG server + pgjdbc driver exist — is everything PostgreSQL-specific:
  * pg_catalog introspection, the `::text`-cast MIN/MAX probe of
  * `tablePartitioned`, and the §2.3 conversion recipes. The two suites
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
      // (the probe's ::text casts are PG dialect — see scaladoc)
      val single = reader.tablePartitioned(spark, "graft_live_t", "id", 1)
      assert(single.count() == 3)
    }
  }
}
