package graft

import java.nio.file.Files

import graft.config.{DatabaseType, Settings}
import org.scalatest.funsuite.AnyFunSuite

/** Layered config: TOML-subset files + `cdl__` env overlay
  * (`settings.rs:59-105`, `config/default.toml`). */
class SettingsSpec extends AnyFunSuite {

  private val defaultToml =
    """# This determines the log level
      |save_location = "/tmp/cdl-save"
      |rocksdb_location = "/tmp/cdl-rocksdb"
      |skip_historical_imports = true
      |# only_load_final = true
      |
      |[canvasdataauth]
      |api_key = "FILL_ME_OUT"
      |api_secret = "FILL_ME_OUT"
      |
      |[database]
      |url = "postgres://localhost/canvas_data_loader"
      |db_type = "Psql"  # Valid Values are Psql, Mysql
      |""".stripMargin

  test("parses the reference's default.toml shape") {
    val m = Settings.parseTomlLines(defaultToml.split("\n").toSeq)
    assert(m("save_location") == "/tmp/cdl-save")
    assert(m("skip_historical_imports") == "true")
    assert(m("canvasdataauth.api_key") == "FILL_ME_OUT")
    assert(m("database.db_type") == "Psql") // inline comment stripped
    assert(!m.contains("only_load_final")) // commented out
  }

  test("local.toml overrides default; cdl__ env overrides both; defaults apply") {
    val dir = TempDirs.tempDir("graft_cfg")
    Files.writeString(dir.resolve("default.toml"), defaultToml)
    Files.writeString(dir.resolve("local.toml"),
      """[canvasdataauth]
        |api_key = "local_key"
        |api_secret = "local_secret"
        |""".stripMargin)

    val s = Settings.load(dir.toString, env = Map(
      "cdl__database__url" -> "/data/warehouse",
      "CDL__ONLY_LOAD_FINAL" -> "true", // env names case-insensitive
      "unrelated" -> "x"))

    assert(s.apiKey == "local_key") // local beats default
    assert(s.databaseUrl == "/data/warehouse") // env beats files
    assert(s.saveLocation == "/tmp/cdl-save") // untouched default survives
    assert(s.skipHistoricalImports)
    assert(s.onlyLoadFinal) // env-only key
    assert(!s.allTablesVolatile) // absent → reference's unwrap_or(false)
    assert(s.databaseType == DatabaseType.Psql)
  }

  test("db_type mysql selects Mysql; anything else falls back to Psql") {
    assert(Settings.fromMap(Map("database.db_type" -> "MySQL")).databaseType == DatabaseType.Mysql)
    assert(Settings.fromMap(Map("database.db_type" -> "oracle")).databaseType == DatabaseType.Psql)
    assert(Settings.fromMap(Map.empty).databaseType == DatabaseType.Psql)
  }

  test("missing required key and missing default.toml are hard errors") {
    intercept[IllegalArgumentException] { Settings.fromMap(Map.empty).saveLocation }
    intercept[IllegalArgumentException] { Settings.load("/nonexistent_cfg_dir") }
  }
}
