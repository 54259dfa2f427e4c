package graft

import java.sql.Timestamp
import java.util.Properties

import graft.schema.{ColumnDefinition, TableDefinition}
import graft.sinks.JdbcSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * LIVE execution of the POSTGRES dialect branch of the relational sink —
 * the branch JdbcLiveSpec (embedded Derby, ANSI-ish but no `IF EXISTS`,
 * bounded VARCHAR) cannot reach. Engine: DuckDB over its JDBC driver,
 * probed from the offline caches at runtime ([[DuckDbProbe]]); DuckDB
 * executes exactly the statement shapes `JdbcSink` generates for
 * Postgres. Covers live: CREATE TABLE IF NOT EXISTS with the psql type
 * row of the 12-type mapping, the metadata existence probe, DROP TABLE
 * IF EXISTS, the staged DELETE-IN-SELECT / INSERT-SELECT / DROP merge in
 * one transaction, reserved-word renames (`"default"` → `"_default"`),
 * and the full Spark-writer `mergeBatch` cycle against a file-backed
 * database (in-memory DuckDB is per-connection, and Spark's JDBC writer
 * opens one connection per partition).
 *
 * MySQL remains statement-golden only: [[DuckDbProbe.mysqlCapableJars]]
 * records that no backtick-capable engine (h2/hsqldb/mariadb/mysql) is
 * resolvable in this sandbox.
 */
class JdbcPsqlLiveSpec extends AnyFunSuite with SparkSuite {

  private val d = JdbcSink.Postgres
  private val props = new Properties()

  // every psql DDL type once, plus the reserved-word column
  private val table = TableDefinition(
    tableName = "quiz_dim",
    dwType = "dimension",
    incremental = true,
    hints = Map.empty,
    columns = Seq(
      ColumnDefinition("id", "bigint", None, None, None),
      ColumnDefinition("name", "varchar", None, Some(255), None),
      ColumnDefinition("created_at", "timestamp", None, None, None),
      ColumnDefinition("is_public", "boolean", None, None, None),
      ColumnDefinition("score", "double precision", None, None, None),
      ColumnDefinition("default", "text", None, None, None),
      ColumnDefinition("n", "int", None, None, None),
      ColumnDefinition("on_date", "date", None, None, None)))

  test("probe: psql-capable engine found; no mysql-capable engine in offline caches") {
    assert(DuckDbProbe.duckdbJar.nonEmpty,
      "duckdb_jdbc jar expected in the pre-warmed coursier cache")
    info(s"psql-dialect engine: ${DuckDbProbe.duckdbJar.get}")
    assert(DuckDbProbe.mysqlCapableJars.isEmpty,
      s"a mysql-capable engine appeared (${DuckDbProbe.mysqlCapableJars}) — " +
        "promote the MySQL dialect branch from golden-pinned to live")
  }

  test("psql statement set executes live: create IF NOT EXISTS, probe, staged merge, drop IF EXISTS") {
    assume(DuckDbProbe.driver.nonEmpty, "no duckdb_jdbc jar — statement set stays golden-pinned")
    val conn = DuckDbProbe.connect("jdbc:duckdb:")
    try {
      // IF NOT EXISTS lives in the statement itself on psql (Derby needs
      // the probe): executing the same CREATE twice must be a no-op
      val st = conn.createStatement()
      try {
        st.execute(JdbcSink.createTableSql(table, d))
        st.execute(JdbcSink.createTableSql(table, d))
        assert(JdbcSink.tableExists(conn, table.tableName))

        // stage rows arrive pre-renamed (mergeBatch contract): "_default"
        st.execute(
          """CREATE TABLE "quiz_dim__stage" ("id" BIGINT, "name" TEXT,
            | "created_at" TIMESTAMP, "is_public" BOOLEAN, "score" double precision,
            | "_default" TEXT, "n" INT, "on_date" DATE)""".stripMargin)
        st.execute(
          """INSERT INTO "quiz_dim" VALUES
            | (1, 'stale', TIMESTAMP '2024-01-01 10:00:00', true, 1.5, 'd1', 7, DATE '2024-01-01'),
            | (9, 'kept',  TIMESTAMP '2024-01-01 11:00:00', false, 9.5, 'd9', 8, DATE '2024-01-02')""".stripMargin)
        st.execute(
          """INSERT INTO "quiz_dim__stage" VALUES
            | (1, 'fresh', TIMESTAMP '2024-02-01 10:00:00', false, 2.5, 'd1b', 17, DATE '2024-02-01'),
            | (2, 'new',   TIMESTAMP '2024-02-01 11:00:00', true, 3.5, 'd2', 27, DATE '2024-02-02')""".stripMargin)
      } finally st.close()

      // the transactional merge triplet, exactly as mergeBatch runs it
      conn.setAutoCommit(false)
      val mst = conn.createStatement()
      try JdbcSink.mergeSql(table, "quiz_dim__stage", d).foreach(mst.execute)
      finally mst.close()
      conn.commit()
      conn.setAutoCommit(true)

      val rs = conn.createStatement().executeQuery(
        """SELECT "id", "name" FROM "quiz_dim" ORDER BY "id"""")
      val rows = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getLong(1), r.getString(2))).toList
      assert(rows == List((1L, "fresh"), (2L, "new"), (9L, "kept")),
        s"merge semantics wrong: $rows")
      assert(!JdbcSink.tableExists(conn, "quiz_dim__stage"), "stage must be dropped")

      // drop-if-exists: present then absent, both fine as bare statements
      JdbcSink.dropTable(conn, table.tableName, d)
      assert(!JdbcSink.tableExists(conn, table.tableName))
      JdbcSink.dropTable(conn, table.tableName, d)
    } finally conn.close()
  }

  test("full Spark mergeBatch cycle on the psql dialect, file-backed DuckDB") {
    assume(DuckDbProbe.driver.nonEmpty, "no duckdb_jdbc jar — cycle stays Derby-only")
    import spark.implicits._
    java.sql.DriverManager.registerDriver(new DuckDbDriverShim())
    // Spark's writer probes table existence with a prepared SELECT and
    // classifies the failure via the dialect; DuckDB's SQLException has no
    // SQLState, so teach the default dialect the one thing it needs
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(
      new org.apache.spark.sql.jdbc.JdbcDialect {
        override def canHandle(url: String): Boolean = url.startsWith("jdbc:duckdb:")
        override def isObjectNotFoundException(e: java.sql.SQLException): Boolean =
          Option(e.getMessage).exists(_.contains("does not exist"))
        // default dialect spells BooleanType as BIT(1); DuckDB wants BOOLEAN
        override def getJDBCType(dt: org.apache.spark.sql.types.DataType) = dt match {
          case org.apache.spark.sql.types.BooleanType =>
            Some(org.apache.spark.sql.jdbc.JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
          case _ => None
        }
      })
    val url = s"jdbc:duckdb:${tempDir("duckdb_live")}/live.duckdb"

    def dump(seq: Long, ids: Range, tag: String) =
      ids.map { i =>
        (i.toLong, s"quiz $i $tag", Timestamp.valueOf(s"2024-01-0$seq 10:00:00"),
          i % 2 == 0, i * 1.5 + seq, s"dflt_$tag", i, java.sql.Date.valueOf("2024-03-01"))
      }.toDF("id", "name", "created_at", "is_public", "score", "default", "n", "on_date")

    JdbcSink.mergeBatch(dump(1, 1 to 10, "a"), url, table, d, props)
    JdbcSink.mergeBatch(dump(2, 6 to 12, "b"), url, table, d, props) // overlap 6..10
    JdbcSink.mergeBatch(dump(2, 6 to 12, "b"), url, table, d, props) // idempotent replay

    val back = spark.read.jdbc(url, d.ident(table.tableName), props)
    assert(back.count() == 12)
    // DuckDB's JDBC metadata surfaces BIGINT as DECIMAL(38,0) to Spark's
    // reader — cast for the assertion; the stored type is checked above
    val tags = back.select(col("id").cast("long").as("id"),
        substring_index(col("name"), " ", -1).as("tag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1 to 5).forall(i => tags(i.toLong) == "a"), "pre-overlap rows kept")
    assert((6 to 12).forall(i => tags(i.toLong) == "b"), "overlap+new rows replaced")
    // reserved-word column landed under its renamed identifier
    assert(back.columns.contains("_default") && !back.columns.contains("default"))
  }
}
