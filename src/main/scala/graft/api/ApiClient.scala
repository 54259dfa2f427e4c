package graft.api

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.time.Instant
import java.util.concurrent.Executors

import graft.schema.{CanvasSchema, SchemaDefinition, TableDefinition}
import org.json4s._
import org.json4s.jackson.JsonMethods

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** One file inside a dump artifact (`api_client.rs:384-392`). */
final case class BasicFile(url: String, filename: String)

/** Per-table artifact listing (`api_client.rs:371-382`). */
final case class ArtifactByTable(tableName: String, partial: Boolean, files: Seq[BasicFile])

/** The `/file/byDump/{id}` response (`api_client.rs:338-368`) — only the
  * fields the control flow consumes; the rest of the payload is ignored on
  * decode rather than modeled dead. */
final case class FilesInDump(
    dumpId: String,
    sequence: Long,
    schemaVersion: String,
    numFiles: Long,
    finished: Boolean,
    artifactsByTable: Map[String, ArtifactByTable]) {

  /** Flattened view for the F-5 historical-refresh test. */
  def artifactFiles: Seq[ArtifactFile] =
    artifactsByTable.values.toSeq.flatMap(a =>
      a.files.map(f => ArtifactFile(a.tableName, a.partial, f.url, f.filename)))
}

/**
 * REST client for the hosted-data API — ops S-1/S-2/S-4/S-5/S-6.
 *
 * Re-expression of `/root/reference/src/api_client.rs:115-305`: the four
 * endpoints (`get_dumps`, `get_latest_schema`, `get_files_for_dump`,
 * `download_files_for_dump`) with HMAC-signed requests, but over an
 * injectable [[Transport]] and a pluggable clock so signing is
 * deterministic under test. Downloads are parallel per table with
 * resume-on-exists (a re-run never re-fetches bytes it already has).
 *
 * Deliberate upgrades over the reference: the schema is fetched ONCE and
 * looked up locally (the reference re-fetches per imported file,
 * `importer.rs:248-258`); `downloadFilesForDump` returns the local
 * table→files map (the reference returns unit and the importer re-globs the
 * save directory).
 */
final class ApiClient(
    apiKey: String,
    apiSecret: String,
    saveLocation: String,
    transport: Transport,
    baseUrl: String = "https://portal.inshosteddata.com",
    clock: () => Instant = () => Instant.now(),
    downloadParallelism: Int = 8,
    // gz is unsplittable: artifacts larger than this (compressed bytes)
    // are re-chunked locally after download so the table scan is not
    // serialized behind one partition (graft.ingest.GzRechunk)
    gzRechunkMaxBytes: Long = 1L << 30) {

  private val host = URIHost.of(baseUrl)

  private def signedGet(path: String): String = {
    val date = HmacSigner.dateHeader(clock())
    val auth = HmacSigner.authHeader(
      apiKey, apiSecret, "GET", host, "application/json", "", path, "", date)
    new String(
      transport.get(
        s"$baseUrl$path",
        Map("Date" -> date, "Content-Type" -> "application/json", "Authorization" -> auth)),
      UTF_8)
  }

  /** S-1: list dumps (`api_client.rs:115-144`, GET /api/account/self/dump). */
  def getDumps(): Seq[DumpInList] =
    JsonMethods.parse(signedGet("/api/account/self/dump")) match {
      case JArray(items) => items.map(decodeDump)
      case other => throw new IllegalArgumentException(s"dump list is not a JSON array: $other")
    }

  /** S-2: latest schema (`api_client.rs:147-176`, GET /api/schema/latest). */
  def getLatestSchema(): SchemaDefinition =
    CanvasSchema.fromJson(signedGet("/api/schema/latest"))

  /** S-3: one table's definition — the reference refetches the whole schema
    * and scans it (`api_client.rs:181-221`); same observable contract here
    * (case-insensitive on the table's declared name). */
  def getTableDefinition(tableName: String): Option[TableDefinition] =
    getLatestSchema().tableDefinition(tableName)

  /** S-4: files for one dump (`api_client.rs:226-259`). */
  def getFilesForDump(dumpId: String): FilesInDump =
    decodeFilesInDump(JsonMethods.parse(signedGet(s"/api/account/self/file/byDump/$dumpId")))

  /** F-5 helper mirroring `is_historical_refresh` (`api_client.rs:101-112`). */
  def isHistoricalRefresh(resp: FilesInDump): Boolean =
    Manifest.isHistoricalRefresh(resp.artifactFiles)

  /**
   * S-5: download every file of a dump (`api_client.rs:264-305`) —
   * parallel across tables, sequential within a table, skip files that
   * already exist locally (idempotent resume). File URLs are pre-signed by
   * the portal: no auth headers on the artifact GETs, same as the reference.
   *
   * @return local paths per table, ready for
   *         [[graft.jobs.IngestJob.loadTable]].
   */
  def downloadFilesForDump(dumpId: String): Map[String, Seq[String]] = {
    val saveDir = Paths.get(saveLocation, dumpId)
    Files.createDirectories(saveDir)
    val artifacts = getFilesForDump(dumpId).artifactsByTable.toSeq

    val pool = Executors.newFixedThreadPool(math.max(1, math.min(downloadParallelism, artifacts.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val work = Future.traverse(artifacts) { case (table, artifact) =>
        Future {
          val paths = artifact.files.flatMap { f =>
            val dest = saveDir.resolve(f.filename)
            // download to a temp name and rename only on success: a failed
            // or interrupted GET must never leave bytes at `dest`, or the
            // resume-by-existence check would treat the partial/error body
            // as a completed artifact forever after. An already-RE-CHUNKED
            // artifact (original deleted after the split) counts as
            // present — GzRechunk.isChunked must be consulted first.
            if (!Files.exists(dest) && !graft.ingest.GzRechunk.isChunked(dest)) {
              val tmp = saveDir.resolve(f.filename + ".part")
              try {
                transport.download(f.url, Map.empty, tmp)
                Files.move(tmp, dest)
              } catch {
                case e: Throwable =>
                  Files.deleteIfExists(tmp)
                  throw e
              }
            }
            graft.ingest.GzRechunk.ensureChunked(dest, gzRechunkMaxBytes)
              .map(_.toString)
          }
          table -> paths
        }
      }
      Await.result(work, Duration.Inf).toMap
    } finally pool.shutdown()
  }

  // --- JSON decode (json4s, same tolerant style as CanvasSchema) ---

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _          => None
  }

  private def long(v: JValue): Option[Long] = v match {
    case JInt(n)     => Some(n.toLong)
    case JLong(n)    => Some(n)
    case JDouble(n)  => Some(n.toLong)
    case JDecimal(n) => Some(n.toLong)
    case _           => None
  }

  private def bool(v: JValue): Boolean = v match {
    case JBool(b) => b
    case _        => false
  }

  private def decodeDump(v: JValue): DumpInList =
    DumpInList(
      dumpId = str(v \ "dumpId").getOrElse(
        throw new IllegalArgumentException("dump missing dumpId")),
      sequence = long(v \ "sequence").getOrElse(0L),
      numFiles = long(v \ "numFiles").getOrElse(0L),
      finished = bool(v \ "finished"),
      createdAt = str(v \ "createdAt").getOrElse(""),
      schemaVersion = str(v \ "schemaVersion").getOrElse(""))

  private def decodeFilesInDump(v: JValue): FilesInDump = {
    val artifacts = (v \ "artifactsByTable") match {
      case JObject(fields) =>
        fields.map { case (table, av) =>
          val files = (av \ "files") match {
            case JArray(items) => items.flatMap { fv =>
              for (u <- str(fv \ "url"); n <- str(fv \ "filename")) yield BasicFile(u, n)
            }
            case _ => Seq.empty
          }
          table -> ArtifactByTable(
            tableName = str(av \ "tableName").getOrElse(table),
            partial = bool(av \ "partial"),
            files = files)
        }.toMap
      case _ => Map.empty[String, ArtifactByTable]
    }
    FilesInDump(
      dumpId = str(v \ "dumpId").getOrElse(""),
      sequence = long(v \ "sequence").getOrElse(0L),
      schemaVersion = str(v \ "schemaVersion").getOrElse(""),
      numFiles = long(v \ "numFiles").getOrElse(0L),
      finished = bool(v \ "finished"),
      artifactsByTable = artifacts)
  }
}

private object URIHost {
  /** Host portion of a base URL, for the canonical signing string. */
  def of(baseUrl: String): String = java.net.URI.create(baseUrl).getHost
}
