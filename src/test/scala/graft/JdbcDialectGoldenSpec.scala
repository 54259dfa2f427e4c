package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.schema.{ColumnDefinition, TableDefinition}
import graft.sinks.JdbcSink
import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden-file pin of the COMPLETE generated statement set per dialect.
 * Postgres and MySQL are the reference's real targets
 * (`/root/reference/src/db_client.rs:82-117` — two dialects with different
 * quoting, charset and cast spellings) but cannot run inside this sandbox
 * (only embedded Derby can, JdbcLiveSpec); these snapshots make every
 * dialect branch reviewable and freeze it against regression:
 * quoting (double-quote vs backtick), `IF NOT EXISTS` (absent on Derby),
 * the MySQL `CHARACTER SET utf8mb4` clause (`db_client.rs:372`),
 * reserved-word renames (`default` everywhere, `generated` MySQL-only,
 * `db_client.rs:346-356,450-457`), the 12-type DDL mapping including the
 * MySQL boolean-as-VARCHAR(10) bug-compat (`type_converter.rs:19`), and
 * the staged merge's DELETE-IN-SELECT / INSERT / DROP triplet.
 *
 * On mismatch the spec writes `<name>.actual` next to the golden file so
 * the diff is one `diff` command away; intentional changes are promoted by
 * replacing the golden file with the actual.
 */
class JdbcDialectGoldenSpec extends AnyFunSuite {

  // every canvas type once, plus both reserved-word columns
  private val table = TableDefinition(
    tableName = "account_dim",
    dwType = "dimension",
    incremental = true,
    hints = Map.empty,
    columns = Seq(
      ColumnDefinition("id", "bigint", None, None, None),
      ColumnDefinition("default", "text", None, None, None),
      ColumnDefinition("generated", "varchar", None, Some(64), None),
      ColumnDefinition("flag", "boolean", None, None, None),
      ColumnDefinition("score", "double precision", None, None, None),
      ColumnDefinition("kind", "enum", None, None, None),
      ColumnDefinition("n", "int", None, None, None),
      ColumnDefinition("body", "text", None, None, None),
      ColumnDefinition("created_at", "timestamp", None, None, None),
      ColumnDefinition("on_date", "date", None, None, None),
      ColumnDefinition("label", "varchar", None, Some(255), None),
      ColumnDefinition("uid", "guid", None, None, None),
      ColumnDefinition("updated_at", "datetime", None, None, None)))

  private def statementSet(d: JdbcSink.Dialect): String = {
    val parts = Seq(
      "-- createTableSql",
      JdbcSink.createTableSql(table, d),
      "-- dropTableSql",
      JdbcSink.dropTableSql(table.tableName, d),
      "-- columnTypesOption",
      JdbcSink.columnTypesOption(table, d)) ++
      Seq("-- mergeSql") ++
      JdbcSink.mergeSql(table, s"${table.tableName}__stage", d)
    parts.mkString("\n") + "\n"
  }

  private def check(name: String, d: JdbcSink.Dialect): Unit = {
    val golden = Paths.get(s"src/test/resources/golden/jdbc_$name.sql")
    val actual = statementSet(d)
    if (!Files.exists(golden)) {
      Files.createDirectories(golden.getParent)
      Files.write(golden, actual.getBytes(StandardCharsets.UTF_8))
      fail(s"golden file bootstrapped at $golden — inspect it and re-run")
    }
    val expected = new String(Files.readAllBytes(golden), StandardCharsets.UTF_8)
    if (actual != expected) {
      val diffPath = golden.resolveSibling(s"jdbc_$name.actual")
      Files.write(diffPath, actual.getBytes(StandardCharsets.UTF_8))
      fail(s"generated $name statements differ from $golden (actual: $diffPath)")
    }
  }

  test("postgres statement set matches golden")(check("psql", JdbcSink.Postgres))
  test("mysql statement set matches golden")(check("mysql", JdbcSink.Mysql))
  test("derby statement set matches golden")(check("derby", JdbcSink.Derby))
}
