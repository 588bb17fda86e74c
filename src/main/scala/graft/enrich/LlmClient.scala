package graft.enrich

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode

/** LLM transport seam (SURVEY.md §2.7 E1).
  *
  * The reference talks to an Azure OpenAI chat-completions endpoint via
  * aiohttp (`src/program2_ai_processor.py:343-515`) but its own tests never
  * hit the network — they fake the session (`tests/test_program2_all.py:70-120`).
  * This build runs zero-egress, so the same seam exists here: `LlmTransport`
  * is the one integration point (an HTTP impl would live behind it), and the
  * deterministic mock is the default used by specs and jobs.
  */
final case class LlmMessage(role: String, content: String)

final case class LlmPayload(messages: Seq[LlmMessage], maxTokens: Int, temperature: Double) {
  def toJson: String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    val arr: ArrayNode = root.putArray("messages")
    messages.foreach { msg =>
      val o = arr.addObject()
      o.put("role", msg.role)
      o.put("content", msg.content)
    }
    root.put("max_tokens", maxTokens)
    root.put("temperature", temperature)
    m.writeValueAsString(root)
  }
}

/** Raw transport result: HTTP status + body text. */
final case class LlmResponse(status: Int, body: String)

/** May throw [[java.io.IOException]] (network) or
  * [[java.util.concurrent.TimeoutException]] — the retry state machine
  * handles both (reference `aiohttp.ClientError` / `TimeoutError` branches).
  */
trait LlmTransport extends Serializable {
  def post(payload: LlmPayload): LlmResponse
}

object LlmTransports {
  /** Resolve the transport the way the reference resolves its client: if an
    * endpoint + key are configured (process env overriding an optional .env
    * file — `OpenAIConfig._load_environment`,
    * `src/program2_ai_processor.py:105-151`), speak real HTTP
    * ([[HttpLlmTransport]]); otherwise fall back to the deterministic mock —
    * the zero-egress default, exactly how the reference's own tests fake the
    * session (`tests/test_program2_all.py:70-120`). Resolved DRIVER-side so
    * the decision ships into executor closures already made.
    */
  def fromEnvironment(envFile: Option[java.nio.file.Path] = None,
      env: Map[String, String] = sys.env): LlmTransport =
    // The mock is ONLY the nothing-configured default. A present-but-invalid
    // config (e.g. AZURE_API_KEY set but AZURE_ENDPOINT_BASE missing) must
    // fail loudly here — silently enriching with fabricated mock output
    // while the user believes a real endpoint is wired would be worse than
    // any crash.
    if (!EnvConfig.anyKeyConfigured(envFile, env)) new MockLlmTransport
    else {
      val cfg = EnvConfig.load(envFile, env) // propagates IllegalArgumentException
      cfg.endpointUrl match {
        case Some(url) => new HttpLlmTransport(url, cfg.apiKey)
        case None => new MockLlmTransport
      }
    }
}

/** Deterministic offline stand-in: echoes a summary derived from the user
  * message, shaped exactly like a chat-completions success body.
  */
final class MockLlmTransport extends LlmTransport {
  override def post(payload: LlmPayload): LlmResponse = {
    val m = new ObjectMapper()
    val user = payload.messages.find(_.role == "user").map(_.content).getOrElse("")
    val digest = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(user))
    val content =
      if (user.contains("'Status: OK'")) "Status: OK" // E8 connectivity probe
      else
        s"```markdown\n## Sammanfattning\n\nDeterministisk beskrivning ($digest, ${user.length} tecken underlag).\n```"
    val root = m.createObjectNode()
    val choice = root.putArray("choices").addObject()
    choice.putObject("message").put("role", "assistant").put("content", content)
    root.put("model", "mock")
    LlmResponse(200, m.writeValueAsString(root))
  }
}
