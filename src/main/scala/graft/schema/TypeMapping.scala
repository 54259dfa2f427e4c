package graft.schema

import org.apache.spark.sql.types._

/**
 * Canvas Data type universe → Spark `DataType` (and, for JDBC sink parity,
 * the DDL type names the reference emits).
 *
 * Reference: `/root/reference/src/type_converter.rs:13-66` defines exactly 12
 * legal input types; anything else is a hard error
 * (`type_converter.rs:62-64`, `errors.rs:10-13`). We reproduce that closed
 * universe. Value-level casting happens ONCE at read time (typed DataFrame)
 * instead of per-row string casts on the write path
 * (`type_converter.rs:76-99`).
 */
object TypeMapping {

  /** Target relational dialects of the reference (`settings.rs` DatabaseType),
    * plus embedded Derby — not a reference target, but the only database
    * that can run INSIDE this build's sandbox, so it is the live-connection
    * integration vehicle for the sink (same ANSI quoting family as psql). */
  sealed trait Dialect
  case object Psql  extends Dialect
  case object Mysql extends Dialect
  case object Derby extends Dialect

  final case class UnknownCanvasType(name: String)
      extends IllegalArgumentException(s"Invalid Type to Convert: $name")

  /**
   * Canvas type → Spark DataType. Mirrors the 12-type table at
   * `type_converter.rs:13-66`.
   */
  def toSparkType(canvasType: String): DataType = canvasType match {
    case "bigint"           => LongType
    case "boolean"          => BooleanType
    case "double precision" => DoubleType
    case "enum"             => StringType
    case "int" | "integer"  => IntegerType
    case "text"             => StringType
    case "timestamp"        => TimestampType
    case "date"             => DateType
    case "varchar"          => StringType // length is metadata only (reference ignores it too)
    case "guid"             => StringType
    case "datetime"         => TimestampType
    case other              => throw UnknownCanvasType(other)
  }

  /**
   * Canvas type → DDL type for a JDBC sink, bug-compatible with
   * `type_converter.rs:13-66` (including MySQL boolean → VARCHAR(10) and
   * varchar-length-ignored). Used only when writing DDL for a relational
   * target; the Spark-side schema always comes from [[toSparkType]].
   */
  def toDdlType(canvasType: String, dialect: Dialect): String =
    (canvasType, dialect) match {
      // Derby first: no TEXT type (bounded VARCHAR stands in), DOUBLE
      // spelling; everything else shares the ANSI rows below
      case ("enum" | "text" | "varchar" | "guid", Derby) => "VARCHAR(32672)"
      case ("double precision", Derby)   => "DOUBLE"
      case ("boolean", Derby)            => "BOOLEAN"
      case ("timestamp" | "datetime", Derby) => "TIMESTAMP"
      case ("bigint", _)                 => "BIGINT"
      case ("boolean", Psql)             => "BOOLEAN"
      case ("boolean", Mysql)            => "VARCHAR(10)"
      case ("double precision", Psql)    => "double precision"
      case ("double precision", Mysql)   => "FLOAT(17)"
      case ("enum", _)                   => "TEXT"
      case ("int" | "integer", _)        => "INT"
      case ("text", Psql)                => "TEXT"
      case ("text", Mysql)               => "LONGTEXT"
      case ("timestamp", Psql)           => "TIMESTAMP"
      case ("timestamp", Mysql)          => "DATETIME"
      case ("date", _)                   => "DATE"
      case ("varchar", Psql)             => "TEXT"
      case ("varchar", Mysql)            => "LONGTEXT"
      case ("guid", Psql)                => "TEXT"
      case ("guid", Mysql)               => "LONGTEXT"
      case ("datetime", Psql)            => "TIMESTAMP"
      case ("datetime", Mysql)           => "DATETIME"
      case (other, _)                    => throw UnknownCanvasType(other)
    }

  /**
   * DDL type → cast-type used when interpolating string values, per
   * `type_converter.rs:76-99`. Empty string = no cast (value stays TEXT).
   * Kept for behavioural parity tests; the Spark path never string-casts.
   */
  def castAs(ddlType: String, dialect: Dialect): String = dialect match {
    case Psql =>
      ddlType.toLowerCase match {
        case "bigint"           => "int8"
        case "boolean"          => "boolean"
        case "double precision" => "double precision"
        case "int"              => "int"
        case "timestamp"        => "timestamp"
        case _                  => ""
      }
    case Mysql =>
      ddlType.toLowerCase match {
        case "bigint"    => "SIGNED"
        case "int"       => "SIGNED"
        case "float(17)" => "DECIMAL(34, 17)"
        case "datetime"  => "DATETIME"
        case "date"      => "DATE"
        case _           => ""
      }
    case Derby => "" // parity table is psql/mysql-only; Derby writes are typed
  }

  /**
   * Reserved-word renames the reference applies when building DDL/INSERT
   * column lists (`db_client.rs:160, 256, 346-356, 450-457`). With proper
   * identifier quoting on a JDBC sink this is unnecessary; exposed behind a
   * flag for bug-compat.
   */
  def compatRename(column: String, dialect: Dialect): String =
    (column, dialect) match {
      case ("default", _)       => "_default"
      case ("generated", Mysql) => "_generated"
      case (c, _)               => c
    }
}
