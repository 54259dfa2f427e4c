package graft.api

import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/**
 * HMAC-SHA256 request signing for the hosted-data REST API — op S-6.
 *
 * Port of `compute_auth_header` (`/root/reference/src/api_client.rs:60-96`):
 * sign the canonical string
 * `method\nhost\ncontentType\ncontentMd5\npath\nquery\ndate\nsecret`
 * with HMAC-SHA256 keyed by the secret, base64 the MAC, emit
 * `HMACAuth {key}:{b64}`. Pure function — property-tested against fixed
 * vectors (the environment is zero-egress; network use is out of scope).
 */
object HmacSigner {

  def canonicalString(
      httpMethod: String,
      host: String,
      contentType: String,
      contentMd5: String,
      path: String,
      queryParams: String,
      dateHeader: String,
      apiSecret: String): String =
    Seq(httpMethod, host, contentType, contentMd5, path, queryParams, dateHeader, apiSecret)
      .mkString("\n")

  def sign(canonical: String, apiSecret: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(apiSecret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    Base64.getEncoder.encodeToString(mac.doFinal(canonical.getBytes(StandardCharsets.UTF_8)))
  }

  def authHeader(
      apiKey: String,
      apiSecret: String,
      httpMethod: String,
      host: String,
      contentType: String,
      contentMd5: String,
      path: String,
      queryParams: String,
      dateHeader: String): String = {
    val canonical = canonicalString(
      httpMethod, host, contentType, contentMd5, path, queryParams, dateHeader, apiSecret)
    s"HMACAuth $apiKey:${sign(canonical, apiSecret)}"
  }

  /** Date header format `%Y-%m-%dT%H:%M:%S%.3fZ` (`api_client.rs:94-96`). */
  private val fmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(ZoneOffset.UTC)

  def dateHeader(at: Instant): String = fmt.format(at)
}
