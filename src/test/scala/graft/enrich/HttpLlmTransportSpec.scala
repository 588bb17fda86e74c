package graft.enrich

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList
import scala.jdk.CollectionConverters._

/** Drives the REAL `java.net.http` transport against a local stub HTTP
  * server through the reference's full response matrix
  * (`src/program2_ai_processor.py:387-515`): success, 429-then-success,
  * persistent 5xx, unparseable-JSON-is-terminal, and request timeout — all
  * through [[RetryingLlmCaller]], so status codes, bodies, and exception
  * types are verified end-to-end over a socket, not a fake.
  */
private final case class Recorded(apiKey: String, contentType: String, body: String)

class HttpLlmTransportSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val recorded = new CopyOnWriteArrayList[Recorded]()
  // each element is (status, body); Int.MinValue status = sleep past timeout
  @volatile private var script: List[(Int, String)] = Nil
  private var server: HttpServer = _
  private def endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/chat"

  private val okBody =
    """{"choices":[{"message":{"role":"assistant","content":"```markdown\nBra skola.\n```"}}]}"""

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/chat", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      recorded.add(Recorded(
        Option(x.getRequestHeaders.getFirst("api-key")).getOrElse(""),
        Option(x.getRequestHeaders.getFirst("Content-Type")).getOrElse(""),
        body))
      val (status, resp) = script match {
        case head :: tail => script = tail; head
        case Nil => (200, okBody)
      }
      if (status == Int.MinValue) Thread.sleep(3000) // force client timeout
      try {
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(if (status == Int.MinValue) 200 else status, bytes.length)
        x.getResponseBody.write(bytes)
        x.close()
      } catch { case _: java.io.IOException => () } // client gave up (timeout case)
    })
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  private def fresh(script: List[(Int, String)], timeoutSeconds: Int = 30):
      (HttpLlmTransport, RetryingLlmCaller, collection.mutable.Buffer[Long]) = {
    recorded.clear()
    this.script = script
    val sleeps = collection.mutable.Buffer[Long]()
    val transport = new HttpLlmTransport(endpoint, "k-123", timeoutSeconds)
    val caller = new RetryingLlmCaller(transport,
      EnrichConfig(maxRetries = 2), sleeper = sleeps += _)
    (transport, caller, sleeps)
  }

  private val payload = LlmPayload(
    Seq(LlmMessage("system", "SYS"), LlmMessage("user", "USER åäö")), 1000, 0.7)

  test("success: status/body pass through, headers and JSON body reach the server") {
    val (_, caller, _) = fresh(Nil)
    val r = caller.call(payload)
    assert(r.ok && r.description.contains("Bra skola."))
    assert(recorded.size == 1)
    val req = recorded.asScala.head
    assert(req.apiKey == "k-123")
    assert(req.contentType == "application/json")
    // body is the exact chat-completions payload shape (UTF-8 intact)
    val json = new com.fasterxml.jackson.databind.ObjectMapper().readTree(req.body)
    assert(json.path("messages").get(1).path("content").asText() == "USER åäö")
    assert(json.path("max_tokens").asInt() == 1000)
    assert(json.path("temperature").asDouble() == 0.7)
  }

  test("429 then success: retried with the reference's 60s*(attempt+1) sleep") {
    val (_, caller, sleeps) = fresh(List((429, """{"error":"rate"}""")))
    val r = caller.call(payload)
    assert(r.ok)
    assert(recorded.size == 2)
    assert(sleeps.head == 60L * 1000)
  }

  test("persistent 5xx: typed error after maxRetries+1 attempts") {
    val (_, caller, sleeps) = fresh(List.fill(3)((503, "upstream down")))
    val r = caller.call(payload)
    assert(!r.ok && r.description.isEmpty)
    assert(recorded.size == 3) // maxRetries=2 -> 3 attempts
    assert(sleeps.size == 2)   // backoff between attempts, none after the last
    val err = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.raw.get)
    assert(err.path("status_code").asInt() == 503)
    assert(err.path("error_body").asText() == "upstream down")
  }

  test("200 with unparseable JSON is terminal: exactly one request, raw body kept") {
    val (_, caller, _) = fresh(List((200, "<html>not json</html>")))
    val r = caller.call(payload)
    assert(!r.ok)
    assert(recorded.size == 1) // JSON decode failure never retries
    val err = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.raw.get)
    assert(err.path("raw_response_text").asText() == "<html>not json</html>")
  }

  test("request timeout surfaces as the TimeoutError branch and retries") {
    val (_, caller, _) = fresh(
      List((Int.MinValue, okBody)), timeoutSeconds = 1)
    val r = caller.call(payload)
    assert(r.ok) // attempt 1 times out, attempt 2 succeeds
    assert(recorded.size == 2)
  }

  test("timeout on every attempt yields the reference's TimeoutError result") {
    val (_, caller, _) = fresh(
      List.fill(3)((Int.MinValue, okBody)), timeoutSeconds = 1)
    val r = caller.call(payload)
    assert(!r.ok)
    val err = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.raw.get)
    assert(err.path("error_type").asText() == "TimeoutError")
  }

  test("connection refused surfaces as the ClientError branch") {
    val transport = new HttpLlmTransport("http://127.0.0.1:1/chat", "k", 2)
    val caller = new RetryingLlmCaller(transport,
      EnrichConfig(maxRetries = 0), sleeper = _ => ())
    val r = caller.call(payload)
    assert(!r.ok)
    val err = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.raw.get)
    assert(err.path("error_type").asText() == "ClientError")
  }

  test("LlmTransports.fromEnvironment picks HTTP with endpoint config, mock without") {
    val withEndpoint = LlmTransports.fromEnvironment(env = Map(
      "AZURE_API_KEY" -> "k", "AZURE_ENDPOINT_BASE" -> "http://127.0.0.1:9"))
    assert(withEndpoint.isInstanceOf[HttpLlmTransport])
    val keyOnly = LlmTransports.fromEnvironment(env = Map("API_KEY" -> "k"))
    assert(keyOnly.isInstanceOf[MockLlmTransport])
    val none = LlmTransports.fromEnvironment(env = Map.empty)
    assert(none.isInstanceOf[MockLlmTransport])
  }

  test("fromEnvironment fails loudly on present-but-invalid config (no silent mock)") {
    // AZURE_API_KEY without AZURE_ENDPOINT_BASE is a misconfiguration: the
    // user clearly intended a real endpoint, so fabricating mock enrichments
    // would mask the error — config validation must propagate.
    intercept[IllegalArgumentException] {
      LlmTransports.fromEnvironment(env = Map("AZURE_API_KEY" -> "k"))
    }
  }

  test("transport survives java serialization (executor closure shipping)") {
    val t = new HttpLlmTransport(endpoint, "k-123", 30)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(t)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject()
      .asInstanceOf[HttpLlmTransport]
    recorded.clear(); script = Nil
    assert(back.post(payload).status == 200)
  }
}
