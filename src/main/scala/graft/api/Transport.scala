package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Path
import java.time.Duration

/**
 * Injectable HTTP transport for the hosted-data REST API.
 *
 * The reference binds `reqwest::Client` directly into its api client
 * (`/root/reference/src/api_client.rs:22-47`), which makes the control plane
 * untestable without the live portal. We invert that: [[ApiClient]] talks to
 * this 2-method trait, production uses [[HttpTransport]], tests use an
 * in-memory fake — the signing, decoding, filtering, and download-resume
 * logic is then exercisable end-to-end in a zero-egress environment.
 */
trait Transport {

  /** GET `url` with `headers`, return the response body. Throws on any
    * non-2xx status or I/O failure (the caller fail-fasts, op X-3). */
  def get(url: String, headers: Map[String, String]): Array[Byte]

  /** GET `url` streaming the body to `dest` (never buffered whole in memory
    * — dump artifacts are multi-GB). Throws on non-2xx or I/O failure. */
  def download(url: String, headers: Map[String, String], dest: Path): Unit
}

/** Production transport on `java.net.http` (JDK 11+, no extra deps). */
final class HttpTransport(timeout: Duration = Duration.ofMinutes(5)) extends Transport {

  private val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  private def request(url: String, headers: Map[String, String]): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET().timeout(timeout)
    headers.foreach { case (k, v) => b.header(k, v) }
    b.build()
  }

  private def check[T](url: String, res: HttpResponse[T]): T = {
    if (res.statusCode() / 100 != 2)
      throw new java.io.IOException(s"GET $url -> HTTP ${res.statusCode()}")
    res.body()
  }

  override def get(url: String, headers: Map[String, String]): Array[Byte] =
    check(url, client.send(request(url, headers), HttpResponse.BodyHandlers.ofByteArray()))

  override def download(url: String, headers: Map[String, String], dest: Path): Unit =
    check(url, client.send(request(url, headers), HttpResponse.BodyHandlers.ofFile(dest)))
}
