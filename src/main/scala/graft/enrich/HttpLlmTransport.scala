package graft.enrich

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, HttpTimeoutException}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Real HTTP transport (E1): a `java.net.http.HttpClient` POST of the
  * chat-completions payload, mirroring the reference's aiohttp call
  * (`src/program2_ai_processor.py:381-402`): `Content-Type: application/json`
  * + `api-key` headers, one total-request timeout (default 300 s,
  * `RefConfig.RequestTimeoutSeconds`), and status + body passed through
  * verbatim — ALL non-200 handling belongs to the retry state machine
  * ([[RetryingLlmCaller]]), not the transport.
  *
  * Exception mapping keeps the reference's three error branches distinct:
  * a request timeout is rethrown as `java.util.concurrent.TimeoutException`
  * (reference `except TimeoutError`, `:489-499`); every other connection
  * failure stays `IOException` (reference `except aiohttp.ClientError`,
  * `:473-488`).
  *
  * Serializable seam: the `HttpClient` is `@transient lazy`, so the
  * transport can be constructed on the driver, shipped inside the enrich
  * `mapPartitions` closure, and (re)build its client per executor JVM.
  */
final class HttpLlmTransport(
    endpoint: String,
    apiKey: String,
    timeoutSeconds: Int = graft.core.RefConfig.RequestTimeoutSeconds)
    extends LlmTransport {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  override def post(payload: LlmPayload): LlmResponse = {
    val request = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
      .header("Content-Type", "application/json")
      .header("api-key", apiKey)
      .POST(HttpRequest.BodyPublishers.ofString(payload.toJson, StandardCharsets.UTF_8))
      .build()
    try {
      val resp = client.send(request, HttpResponse.BodyHandlers.ofString())
      LlmResponse(resp.statusCode(), resp.body())
    } catch {
      case e: HttpTimeoutException =>
        // HttpTimeoutException extends IOException; surface it as the
        // TimeoutError branch, not ClientError
        throw new java.util.concurrent.TimeoutException(
          s"request to $endpoint timed out after ${timeoutSeconds}s: ${e.getMessage}")
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw new java.io.IOException("interrupted while calling LLM endpoint", e)
    }
  }
}
