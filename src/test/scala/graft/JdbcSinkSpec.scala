package graft

import graft.schema.{ColumnDefinition, TableDefinition}
import graft.sinks.JdbcSink
import org.scalatest.funsuite.AnyFunSuite

/** SQL-string builders of the relational sink (dialect DDL, reserved-word
  * renames, staged merge) — testable without a database, per SURVEY §5. */
class JdbcSinkSpec extends AnyFunSuite {

  private def col(n: String, t: String) = ColumnDefinition(n, t, None, None, None)

  private val userDim = TableDefinition(
    "user_dim", "dimension", incremental = true, Map.empty,
    Seq(col("id", "bigint"), col("name", "varchar"), col("default", "varchar"),
      col("muted", "boolean"), col("generated", "varchar")))

  test("postgres DDL: types + reserved-word rename (default→_default)") {
    val sql = JdbcSink.createTableSql(userDim, JdbcSink.Postgres)
    assert(sql ==
      """CREATE TABLE IF NOT EXISTS "user_dim" ("id" BIGINT, "name" TEXT, "_default" TEXT, "muted" BOOLEAN, "generated" TEXT)""")
  }

  test("mysql DDL: utf8mb4, boolean→VARCHAR(10), generated→_generated") {
    val sql = JdbcSink.createTableSql(userDim, JdbcSink.Mysql)
    assert(sql ==
      "CREATE TABLE IF NOT EXISTS `user_dim` (`id` BIGINT, `name` LONGTEXT, `_default` LONGTEXT, " +
        "`muted` VARCHAR(10), `_generated` LONGTEXT) CHARACTER SET utf8mb4")
  }

  test("drop table") {
    assert(JdbcSink.dropTableSql("requests", JdbcSink.Postgres) ==
      """DROP TABLE IF EXISTS "requests"""")
  }

  test("staged merge: one DELETE + one INSERT + stage cleanup, keyed by inferred PK") {
    val stmts = JdbcSink.mergeSql(userDim, "user_dim__stage", JdbcSink.Postgres)
    // note: generated→_generated is a MySQL-only rename (db_client.rs:350-355)
    assert(stmts == Seq(
      """DELETE FROM "user_dim" WHERE "id" IN (SELECT "id" FROM "user_dim__stage")""",
      """INSERT INTO "user_dim" ("id", "name", "_default", "muted", "generated") SELECT "id", "name", "_default", "muted", "generated" FROM "user_dim__stage"""",
      """DROP TABLE "user_dim__stage""""))
  }

  test("merge on a table without an inferable PK is refused") {
    val t = TableDefinition("requests", "fact", incremental = false, Map.empty,
      Seq(col("guid", "guid"), col("url", "text")))
    intercept[IllegalArgumentException](JdbcSink.mergeSql(t, "s", JdbcSink.Postgres))
  }

  test("createTableColumnTypes option mirrors the DDL types") {
    assert(JdbcSink.columnTypesOption(userDim, JdbcSink.Postgres) ==
      "id BIGINT, name TEXT, _default TEXT, muted BOOLEAN, generated TEXT")
  }
}
