package graft.config

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Database kinds the loader targets (`settings.rs:9-15`). */
sealed trait DatabaseType
object DatabaseType {
  case object Psql extends DatabaseType
  case object Mysql extends DatabaseType
}

/**
 * Layered runtime configuration — re-expression of
 * `/root/reference/src/settings.rs:59-105` + `config/default.toml`:
 * `config/default.toml` (required) merged with `config/local.toml`
 * (optional) merged with environment variables prefixed `cdl` and
 * `__`-separated (`cdl__database__url` overrides `[database] url`), later
 * layers winning. Same key names as the reference so an existing deployment's
 * config carries over unchanged.
 *
 * The file format is the TOML subset the reference's config actually uses:
 * `[section]` headers, `key = value` with quoted strings / booleans /
 * integers, `#` comments. No external parser dependency.
 */
final class Settings private (values: Map[String, String]) {

  private def req(key: String): String = values.getOrElse(
    key, throw new IllegalArgumentException(s"missing required config key: $key"))

  private def boolOr(key: String, dflt: Boolean): Boolean =
    values.get(key).map(_.trim.equalsIgnoreCase("true")).getOrElse(dflt)

  def saveLocation: String = req("save_location")
  /** The reference's key name for its local KV store; backs [[graft.state.IngestState]]. */
  def rocksdbLocation: String = req("rocksdb_location")
  def skipHistoricalImports: Boolean = boolOr("skip_historical_imports", dflt = false)
  def onlyLoadFinal: Boolean = boolOr("only_load_final", dflt = false)
  def allTablesVolatile: Boolean = boolOr("all_tables_volatile", dflt = false)

  def apiKey: String = req("canvasdataauth.api_key")
  def apiSecret: String = req("canvasdataauth.api_secret")

  def databaseUrl: String = req("database.url")
  def databaseType: DatabaseType =
    values.get("database.db_type").map(_.trim.toLowerCase) match {
      case Some("mysql") => DatabaseType.Mysql
      case _             => DatabaseType.Psql // reference defaults non-mysql to Psql
    }

  /** Raw lookup for extension keys (e.g. a base-URL override in tests). */
  def get(key: String): Option[String] = values.get(key)
}

object Settings {

  /** Load the reference's layering: default.toml < local.toml < `cdl__` env.
    * `env` is injectable so the overlay is unit-testable. */
  def load(configDir: String = "config", env: Map[String, String] = sys.env): Settings = {
    val default = Paths.get(configDir, "default.toml")
    if (!Files.exists(default))
      throw new IllegalArgumentException(s"required config file not found: $default")
    val local = Paths.get(configDir, "local.toml")
    val fromFiles =
      parseToml(default) ++ (if (Files.exists(local)) parseToml(local) else Map.empty)
    new Settings(fromFiles ++ envOverlay(env))
  }

  /** Build directly from key/value pairs (programmatic + test use). */
  def fromMap(values: Map[String, String]): Settings = new Settings(values)

  /** `cdl__section__key` → `section.key`; `cdl__key` → `key`. */
  private[config] def envOverlay(env: Map[String, String]): Map[String, String] =
    env.flatMap { case (k, v) =>
      val lower = k.toLowerCase
      if (lower.startsWith("cdl__"))
        Some(lower.stripPrefix("cdl__").split("__").mkString(".") -> v)
      else None
    }

  private[config] def parseToml(path: Path): Map[String, String] =
    parseTomlLines(Files.readAllLines(path).asScala.toSeq)

  private[graft] def parseTomlLines(lines: Seq[String]): Map[String, String] = {
    var section = ""
    val out = Map.newBuilder[String, String]
    for (raw <- lines) {
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
        } else if (line.contains("=")) {
          val Array(k, v) = line.split("=", 2)
          val key = (if (section.isEmpty) "" else section + ".") + k.trim
          out += key -> decodeValue(v.trim)
        }
      }
    }
    out.result()
  }

  private def decodeValue(v: String): String =
    if (v.startsWith("\"")) { // quoted string: take through the closing quote
      val end = v.indexOf('"', 1)
      if (end < 0) v.substring(1) else v.substring(1, end)
    } else { // bare bool/number: strip a trailing comment
      val hash = v.indexOf('#')
      (if (hash >= 0) v.substring(0, hash) else v).trim
    }
}
