package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}
import java.time.Instant
import java.util.zip.GZIPOutputStream

import graft.api.{ApiClient, HmacSigner, Transport}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** In-memory [[Transport]]: url → bytes, with request/download recording so
  * specs can assert signing headers and resume-on-exists behavior. */
class FakeTransport(routes: Map[String, Array[Byte]]) extends Transport {
  val requests: mutable.Buffer[(String, Map[String, String])] = mutable.Buffer.empty
  val downloads: mutable.Buffer[String] = mutable.Buffer.empty

  private def body(url: String): Array[Byte] =
    routes.getOrElse(url, throw new java.io.IOException(s"GET $url -> HTTP 404"))

  override def get(url: String, headers: Map[String, String]): Array[Byte] = {
    requests.synchronized { requests += (url -> headers) }
    body(url)
  }

  override def download(url: String, headers: Map[String, String], dest: Path): Unit = {
    downloads.synchronized { downloads += url }
    Files.write(dest, body(url))
  }
}

object FakeTransport {
  def gzBytes(lines: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new GZIPOutputStream(bos)
    lines.foreach { l => w.write(l.getBytes("UTF-8")); w.write('\n') }
    w.close()
    bos.toByteArray
  }
}

/** REST client over the injectable transport: signing, decoding, and the
  * parallel download with idempotent resume (ops S-1/S-2/S-4/S-5/S-6). */
class ApiClientSpec extends AnyFunSuite {

  private val base = "https://portal.example"
  private val fixedNow = Instant.parse("2024-03-01T10:20:30.123Z")

  private val dumpsJson =
    """[
      | {"dumpId":"dump2","sequence":2,"accountId":"self","numFiles":1,"finished":true,
      |  "expires":0,"updatedAt":"2024-02-02T00:00:00Z","createdAt":"2024-02-02T00:00:00Z",
      |  "schemaVersion":"1.0.0"},
      | {"dumpId":"dump1","sequence":1,"accountId":"self","numFiles":2,"finished":false,
      |  "expires":0,"updatedAt":"2024-01-02T00:00:00Z","createdAt":"2024-01-02T00:00:00Z",
      |  "schemaVersion":"1.0.0"}
      |]""".stripMargin

  private val filesJson =
    s"""{"accountId":"self","dumpId":"dump2","sequence":2,"schemaVersion":"1.0.0",
       | "numFiles":2,"finished":true,"expires":0,"createdAt":"2024-02-02T00:00:00Z",
       | "updatedAt":"2024-02-02T00:00:00Z",
       | "artifactsByTable":{
       |  "user_dim":{"tableName":"user_dim","partial":false,"files":[
       |    {"url":"$base/files/user_dim-00000-aa.gz","filename":"user_dim-00000-aa.gz"},
       |    {"url":"$base/files/user_dim-00001-bb.gz","filename":"user_dim-00001-bb.gz"}]},
       |  "quiz_dim":{"tableName":"quiz_dim","partial":false,"files":[
       |    {"url":"$base/files/quiz_dim-00000-cc.gz","filename":"quiz_dim-00000-cc.gz"}]}
       | }}""".stripMargin

  private val schemaJson =
    """{"version":"1.0.0","schema":{
      | "user_dim":{"dw_type":"dimension","incremental":true,"tableName":"user_dim",
      |   "columns":[{"name":"id","type":"bigint"},{"name":"name","type":"varchar"}]}
      |}}""".stripMargin

  private def routes: Map[String, Array[Byte]] = Map(
    s"$base/api/account/self/dump" -> dumpsJson.getBytes("UTF-8"),
    s"$base/api/schema/latest" -> schemaJson.getBytes("UTF-8"),
    s"$base/api/account/self/file/byDump/dump2" -> filesJson.getBytes("UTF-8"),
    s"$base/files/user_dim-00000-aa.gz" -> FakeTransport.gzBytes(Seq("1\talice")),
    s"$base/files/user_dim-00001-bb.gz" -> FakeTransport.gzBytes(Seq("2\tbob")),
    s"$base/files/quiz_dim-00000-cc.gz" -> FakeTransport.gzBytes(Seq("10\tquiz")))

  private def client(t: FakeTransport, save: String) =
    new ApiClient("the_key", "the_secret", save, t, baseUrl = base, clock = () => fixedNow)

  test("getDumps decodes the listing and requests carry the HMAC auth headers") {
    val t = new FakeTransport(routes)
    val dumps = client(t, "/tmp/unused").getDumps()
    assert(dumps.map(_.dumpId) == Seq("dump2", "dump1"))
    assert(dumps.head.sequence == 2 && dumps.head.finished)
    assert(!dumps(1).finished)

    val (_, headers) = t.requests.head
    val date = HmacSigner.dateHeader(fixedNow)
    assert(headers("Date") == date)
    assert(headers("Content-Type") == "application/json")
    // exact header the reference would compute for this request (S-6)
    assert(headers("Authorization") == HmacSigner.authHeader(
      "the_key", "the_secret", "GET", "portal.example", "application/json", "",
      "/api/account/self/dump", "", date))
  }

  test("getLatestSchema + getTableDefinition share the decoded catalog") {
    val t = new FakeTransport(routes)
    val c = client(t, "/tmp/unused")
    assert(c.getLatestSchema().version == "1.0.0")
    assert(c.getTableDefinition("USER_DIM").map(_.columns.map(_.name)) ==
      Some(Seq("id", "name")))
    assert(c.getTableDefinition("nope").isEmpty)
  }

  test("getFilesForDump decodes artifacts; files-for-dump path is signed per dump id") {
    val t = new FakeTransport(routes)
    val resp = client(t, "/tmp/unused").getFilesForDump("dump2")
    assert(resp.dumpId == "dump2")
    assert(resp.artifactsByTable.keySet == Set("user_dim", "quiz_dim"))
    assert(resp.artifactsByTable("user_dim").files.map(_.filename) ==
      Seq("user_dim-00000-aa.gz", "user_dim-00001-bb.gz"))
    assert(resp.artifactFiles.size == 3)
    val (url, headers) = t.requests.head
    assert(url.endsWith("/api/account/self/file/byDump/dump2"))
    val date = HmacSigner.dateHeader(fixedNow)
    assert(headers("Authorization") == HmacSigner.authHeader(
      "the_key", "the_secret", "GET", "portal.example", "application/json", "",
      "/api/account/self/file/byDump/dump2", "", date))
  }

  test("downloadFilesForDump fetches all files once and resumes on re-run (S-5)") {
    val save = TempDirs.tempDir("graft_dl").toString
    val t = new FakeTransport(routes)
    val c = client(t, save)

    val first = c.downloadFilesForDump("dump2")
    assert(first.keySet == Set("user_dim", "quiz_dim"))
    assert(first("user_dim").size == 2 && first("quiz_dim").size == 1)
    first.values.flatten.foreach(p => assert(Files.exists(java.nio.file.Paths.get(p))))
    assert(t.downloads.size == 3)

    // artifact GETs are unsigned (pre-signed URLs, api_client.rs:290-297)
    assert(t.downloads.forall(_.startsWith(s"$base/files/")))

    // second run: every file already on disk → zero new byte fetches
    val second = c.downloadFilesForDump("dump2")
    assert(second == first)
    assert(t.downloads.size == 3)
  }

  test("partial resume: only the missing file is re-fetched") {
    val save = TempDirs.tempDir("graft_dl2").toString
    val t = new FakeTransport(routes)
    val c = client(t, save)
    c.downloadFilesForDump("dump2")
    assert(t.downloads.size == 3)

    Files.delete(java.nio.file.Paths.get(save, "dump2", "user_dim-00001-bb.gz"))
    c.downloadFilesForDump("dump2")
    assert(t.downloads.size == 4)
    assert(t.downloads.last.endsWith("user_dim-00001-bb.gz"))
  }

  test("oversized artifact is re-chunked after download; the marker resumes without re-fetch") {
    val save = TempDirs.tempDir("graft_dl_rechunk").toString
    val bigLines = (1 to 500).map(i => s"$i\tuser_$i")
    val t = new FakeTransport(routes +
      (s"$base/files/user_dim-00000-aa.gz" -> FakeTransport.gzBytes(bigLines)))
    // threshold below the big artifact but above the small ones
    val c = new ApiClient("the_key", "the_secret", save, t, baseUrl = base,
      clock = () => fixedNow, gzRechunkMaxBytes = 512L)
    val first = c.downloadFilesForDump("dump2")
    val userPaths = first("user_dim")
    assert(userPaths.count(_.contains("user_dim-00000-aa.gz.rechunk")) > 1,
      s"oversized artifact not split: $userPaths")
    assert(userPaths.exists(_.endsWith("user_dim-00001-bb.gz")),
      "small artifact must pass through untouched")

    // resume: original is gone, marker stands in — zero re-fetches
    val fetched = t.downloads.size
    val second = c.downloadFilesForDump("dump2")
    assert(second == first)
    assert(t.downloads.size == fetched)

    // byte identity through the split
    val lines = userPaths.filter(_.contains(".rechunk")).flatMap { p =>
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        new java.util.zip.GZIPInputStream(Files.newInputStream(
          java.nio.file.Paths.get(p))), "UTF-8"))
      try Iterator.continually(in.readLine()).takeWhile(_ != null).toList
      finally in.close()
    }
    assert(lines == bigLines, "re-chunked parts must concatenate to the original lines")
  }

  test("non-2xx fails fast instead of decoding garbage") {
    val t = new FakeTransport(Map.empty)
    intercept[java.io.IOException] { client(t, "/tmp/unused").getDumps() }
  }

  test("a failed download leaves nothing at dest; the retry re-fetches it") {
    val save = TempDirs.tempDir("graft_dl3").toString
    // transport that writes a partial body then dies on the first attempt
    // for one file — like a mid-stream disconnect or an error page
    val t = new FakeTransport(routes) {
      private var failedOnce = false
      override def download(url: String, headers: Map[String, String], dest: Path): Unit = {
        if (url.endsWith("user_dim-00001-bb.gz") && !failedOnce) {
          failedOnce = true
          Files.write(dest, "partial garbage".getBytes("UTF-8"))
          throw new java.io.IOException(s"GET $url -> connection reset")
        }
        super.download(url, headers, dest)
      }
    }
    val c = client(t, save)
    intercept[Exception] { c.downloadFilesForDump("dump2") }
    // neither the real name nor the temp name survived the failure
    val dir = java.nio.file.Paths.get(save, "dump2")
    assert(!Files.exists(dir.resolve("user_dim-00001-bb.gz")))
    assert(!Files.exists(dir.resolve("user_dim-00001-bb.gz.part")))

    // retry succeeds and the artifact now carries the REAL bytes
    val second = c.downloadFilesForDump("dump2")
    assert(second("user_dim").size == 2)
    val bytes = Files.readAllBytes(dir.resolve("user_dim-00001-bb.gz"))
    assert(bytes.sameElements(FakeTransport.gzBytes(Seq("2\tbob"))))
  }
}
