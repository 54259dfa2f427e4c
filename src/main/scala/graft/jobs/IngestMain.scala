package graft.jobs

import graft.api.{ApiClient, HttpTransport, Transport}
import graft.config.Settings
import graft.state.IngestState
import org.apache.spark.sql.SparkSession

/**
 * The runnable front door — re-expression of the reference's binary
 * (`/root/reference/src/main.rs:55-249`): settings → API client → dump
 * listing → latest schema → state store → per-dump import, with all the
 * skip rules and state transitions delegated to [[IngestJob.run]].
 *
 * Mapping note (SURVEY §4): the Spark-native "database" is the parquet
 * warehouse. A plain-path `database.url` is the warehouse root; a
 * `jdbc:…` url activates the reference's ACTUAL semantics — every dump
 * additionally loads into the RDBMS through [[graft.sinks.JdbcSink]]'s
 * staged merge (dialect from `database.db_type`, Derby auto-detected for
 * the in-sandbox live path) while the lake lives under
 * `save_location/warehouse` as the engine's working store. Config keys
 * otherwise carry the reference's names verbatim (`settings.rs:40-57`).
 */
object IngestMain {

  /** Wire settings + transport into one full ingest pass. Separated from
    * `main` so tests drive it with a fake transport and local spark. */
  def run(spark: SparkSession, settings: Settings, transport: Transport): Unit = {
    val client = new ApiClient(
      settings.apiKey,
      settings.apiSecret,
      settings.saveLocation,
      transport,
      baseUrl = settings.get("api_base_url")
        .getOrElse("https://portal.inshosteddata.com"))

    // main.rs:65-68 — list dumps, chronological order (SO-1; IngestJob's
    // manifest selection re-sorts declaratively, this keeps parity of intent)
    val dumps = client.getDumps().sortBy(_.createdAt)
    val schema = client.getLatestSchema()
    val state = new IngestState(spark, settings.rocksdbLocation)

    val isJdbc = settings.databaseUrl.startsWith("jdbc:")
    val job = new IngestJob(
      spark,
      schema,
      warehouseDir =
        if (isJdbc) s"${settings.saveLocation}/warehouse" else settings.databaseUrl,
      state = state,
      skipHistoricalImports = settings.skipHistoricalImports,
      allVolatile = settings.allTablesVolatile,
      jdbc =
        if (isJdbc) Some(JdbcTarget.forUrl(settings.databaseUrl, settings.databaseType))
        else None)

    job.run(dumps, client.downloadFilesForDump, settings.onlyLoadFinal)
  }

  def main(args: Array[String]): Unit = {
    val configDir = args.headOption.getOrElse("config")
    val settings = Settings.load(configDir)
    val spark = SparkSession.builder()
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    try IngestMain.run(spark, settings, new HttpTransport())
    finally spark.stop()
  }
}
