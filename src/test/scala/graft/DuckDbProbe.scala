package graft

import java.io.File
import java.net.URLClassLoader
import java.sql.{Connection, Driver, DriverPropertyInfo}
import java.util.Properties
import java.util.logging.Logger

/**
 * Runtime probe for an embeddable engine that can execute the POSTGRES
 * dialect branch of [[graft.sinks.JdbcSink]] live. The sandbox resolves no
 * new `libraryDependencies` (offline coursier), so this never touches the
 * build: it walks the pre-warmed local caches for a `duckdb_jdbc` jar and
 * loads the driver reflectively. DuckDB speaks the Postgres surface the
 * sink generates — double-quoted case-preserved identifiers,
 * `IF (NOT) EXISTS`, ANSI types (BIGINT/TEXT/BOOLEAN/double
 * precision/TIMESTAMP/DATE), DELETE-IN-SELECT, transactional
 * commit/rollback — which is exactly the branch Derby cannot exercise.
 *
 * MySQL's branch (backtick quoting, `CHARACTER SET utf8mb4`,
 * LONGTEXT/DATETIME/FLOAT(17)) has NO runnable engine in the offline
 * caches — probed for h2/hsqldb/mariadb/mysql jars: none present — so it
 * stays golden-pinned (JdbcDialectGoldenSpec); the probe test records
 * that fact every run.
 *
 * Probe log (standing per-round re-check, ordered in round 11):
 *  - 2026-08-13 (r11), 2026-08-14 (r12): no mysql-capable jar.
 *  - 2026-08-15 (r14): re-ran JdbcPsqlLiveSpec — duckdb_jdbc present,
 *    `mysqlCapableJars` still empty (h2/hsqldb/mariadb/mysql absent from
 *    ~/.cache/coursier, ~/.ivy2, ~/.m2). MySQL dialect remains
 *    golden-pinned only; environment-blocked, not a coverage choice.
 *  - 2026-08-15 (r15): re-probed all three cache roots (find over
 *    *.jar): zero h2/hsqldb/mariadb/mysql hits; duckdb_jdbc 1.0.0 is
 *    still the only embeddable engine. Unchanged — MySQL branch stays
 *    golden-pinned, Postgres branch live via DuckDB + Derby.
 *  - 2026-08-16 (r16): same find over ~/.cache/coursier/v1, ~/.ivy2,
 *    ~/.m2 — zero mysql-capable jars; duckdb_jdbc 1.0.0 unchanged.
 *    MySQL dialect remains golden-pinned; environment-blocked.
 *  - 2026-08-16 (r17): re-ran the find over all three cache roots —
 *    zero h2/hsqldb/mariadb/mysql jars; duckdb_jdbc 1.0.0 still the
 *    only embeddable engine. Unchanged; environment-blocked.
 *  - 2026-08-16 (r18): re-probed all three cache roots AND
 *    /opt/spark/jars — zero h2/hsqldb/mariadb/mysql jars anywhere.
 *    Unchanged; MySQL dialect stays golden-pinned, environment-blocked.
 *
 * The loader and driver are cached in this object: DuckDB's JDBC driver
 * extracts and `System.load`s a native library once per classloader, and
 * a second loader in the same JVM would hit "already loaded in another
 * classloader".
 */
object DuckDbProbe {

  /** Jar name patterns that could host a second live dialect. */
  private val mysqlCapable = Seq("h2-", "hsqldb", "mariadb", "mysql")

  private def cacheRoots: Seq[File] = {
    val home = sys.props.getOrElse("user.home", "/root")
    Seq(
      new File(s"$home/.cache/coursier/v1"),
      new File(s"$home/.ivy2"),
      new File(s"$home/.m2"))
      .filter(_.isDirectory)
  }

  private def findJars(pred: String => Boolean): Seq[File] = {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    cacheRoots.flatMap { root =>
      val stream = Files.walk(root.toPath)
      try stream.iterator().asScala
        .filter(p => {
          val n = p.getFileName.toString
          n.endsWith(".jar") && pred(n.toLowerCase)
        })
        .map((p: Path) => p.toFile).toList
      finally stream.close()
    }
  }

  lazy val duckdbJar: Option[File] =
    findJars(_.startsWith("duckdb_jdbc")).headOption

  /** Recorded result of the MySQL-capable engine probe (expected empty
    * in this sandbox — asserted, so a future cache change surfaces). */
  lazy val mysqlCapableJars: Seq[File] =
    findJars(n => mysqlCapable.exists(n.contains))

  lazy val driver: Option[Driver] = duckdbJar.map { jar =>
    val loader = new URLClassLoader(Array(jar.toURI.toURL), getClass.getClassLoader)
    val cls = Class.forName("org.duckdb.DuckDBDriver", true, loader)
    cls.getDeclaredConstructor().newInstance().asInstanceOf[Driver]
  }

  def connect(url: String): Connection =
    driver
      .getOrElse(sys.error("no duckdb_jdbc jar in the offline caches"))
      .connect(url, new Properties())
}

/**
 * `java.sql.Driver` shim with a public no-arg constructor so Spark's JDBC
 * source can use the reflectively-loaded DuckDB driver: Spark resolves the
 * driver FOR a URL via `DriverManager.getDriver(url).getClass
 * .getCanonicalName` and then re-instantiates that class by name
 * (`DriverRegistry.register`) — both steps need a class that is ON the
 * classpath and self-constructs, which the cache-loaded DuckDBDriver
 * isn't. Register once with `DriverManager.registerDriver(new
 * DuckDbDriverShim())`.
 */
class DuckDbDriverShim() extends Driver {
  private val underlying: Driver = DuckDbProbe.driver
    .getOrElse(sys.error("no duckdb_jdbc jar in the offline caches"))

  override def connect(url: String, info: Properties): Connection =
    if (acceptsURL(url)) underlying.connect(url, info) else null
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:duckdb:")
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    underlying.getPropertyInfo(url, info)
  override def getMajorVersion: Int = underlying.getMajorVersion
  override def getMinorVersion: Int = underlying.getMinorVersion
  override def jdbcCompliant(): Boolean = underlying.jdbcCompliant()
  override def getParentLogger: Logger = underlying.getParentLogger
}
