package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest}
import java.net.http.HttpResponse.BodyHandlers

import scala.jdk.CollectionConverters._

/** Production [[Auth.HttpTransport]] adapter over the JDK's built-in
  * `java.net.http.HttpClient` (JEP 321) — the real-socket
  * implementation behind the seam every auth/export leg is programmed
  * against (the reference shells out to `requests`,
  * `__init__.py:31-336`; this is the zero-dependency JVM equivalent).
  *
  * Contract choices, matching what the scripted test transports
  * already pin:
  *   - non-2xx statuses come back as ordinary [[Auth.HttpResponse]]s —
  *     the CALLER decides what is fatal (`tokenEndpoint` raises,
  *     pollers retry on 202); only transport-level failures
  *     (unreachable host, timeout) throw.
  *   - redirects are NOT followed: the bulk-export kickoff speaks in
  *     3xx-adjacent 202s + `Content-Location`, and an auth server
  *     redirect is something the chain must SEE, not silently chase.
  *   - form bodies are `application/x-www-form-urlencoded` with
  *     URL-encoded keys and values, exactly what the token endpoint's
  *     `postForm` contract requires.
  *   - response header names keep the server's casing (multi-valued
  *     headers comma-joined); the flow code matches them
  *     case-insensitively per RFC 9110 (see `kickoffExport`).
  *
  * Exercised in JdkHttpTransportSpec against an in-process
  * `com.sun.net.httpserver` stub bound to 127.0.0.1 — a real socket
  * round-trip with no egress, proving the seam contract end-to-end
  * including the full authorized-export flow.
  */
final class JdkHttpTransport(
    timeout: java.time.Duration = java.time.Duration.ofSeconds(30))
  extends Auth.HttpTransport {

  private val client = HttpClient.newBuilder()
    .connectTimeout(timeout)
    .followRedirects(HttpClient.Redirect.NEVER)
    .build()

  private def send(b: HttpRequest.Builder,
                   headers: Map[String, String]): Auth.HttpResponse = {
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.timeout(timeout).build(), BodyHandlers.ofString())
    val hs = resp.headers().map().asScala.map { case (k, vs) =>
      k -> vs.asScala.mkString(",")
    }.toMap
    Auth.HttpResponse(resp.statusCode(), resp.body(), hs)
  }

  override def get(url: String,
                   headers: Map[String, String] = Map.empty): Auth.HttpResponse =
    send(HttpRequest.newBuilder(URI.create(url)).GET(), headers)

  override def postForm(url: String, form: Seq[(String, String)],
                        headers: Map[String, String] = Map.empty): Auth.HttpResponse = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val body = form.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    send(
      HttpRequest.newBuilder(URI.create(url))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body)),
      headers)
  }
}
