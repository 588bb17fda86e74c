package graft.enrich

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** S7: .env / environment configuration source (SURVEY.md §2.1).
  *
  * Reference semantics: `OpenAIConfig._load_environment`
  * (`src/program2_ai_processor.py:105-151`) and `parse_env_file`
  * (`setup_project.py:1409-1431`): `KEY=VALUE` lines with optional quotes
  * and `#` comments; process environment overrides the file; a plain
  * `API_KEY` is preferred over `AZURE_API_KEY` so ambient Azure variables
  * don't flip the mode; missing required keys raise.
  */
final case class LlmEndpointConfig(
    apiKey: String,
    endpointBase: Option[String],
    deploymentName: String,
    apiVersion: String) {
  /** Azure chat-completions URL shape (`src/program2_ai_processor.py:153-168`). */
  def endpointUrl: Option[String] = endpointBase.map { base =>
    s"${base.stripSuffix("/")}/openai/deployments/$deploymentName/chat/completions?api-version=$apiVersion"
  }
}

object EnvConfig {
  val DefaultDeploymentName = "gpt-4o"
  val DefaultApiVersion = "2024-05-01-preview"

  /** `KEY=VALUE` lines; surrounding single/double quotes stripped; blank
    * lines and `#` comments ignored; malformed lines skipped.
    */
  def parseEnvFile(content: String): Map[String, String] =
    content.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .flatMap { line =>
        val i = line.indexOf('=')
        val k = line.substring(0, i).trim
        var v = line.substring(i + 1).trim
        if (v.length >= 2 &&
          ((v.startsWith("\"") && v.endsWith("\"")) || (v.startsWith("'") && v.endsWith("'"))))
          v = v.substring(1, v.length - 1)
        if (k.nonEmpty) Some(k -> v) else None
      }
      .toMap

  /** True iff some API key is configured at all (process env or .env file).
    * Distinguishes "nothing configured → zero-egress mock is the right
    * default" from "configured but invalid → [[load]] must be allowed to
    * fail loudly" (see [[LlmTransports.fromEnvironment]]).
    */
  def anyKeyConfigured(envFile: Option[Path], env: Map[String, String] = sys.env): Boolean = {
    val fromFile = envFile
      .filter(Files.exists(_))
      .map(p => parseEnvFile(Files.readString(p)))
      .getOrElse(Map.empty)
    Seq("API_KEY", "AZURE_API_KEY")
      .exists(k => env.get(k).orElse(fromFile.get(k)).exists(_.nonEmpty))
  }

  /** File values overridden by `env` (process environment semantics). */
  def load(envFile: Option[Path], env: Map[String, String] = sys.env): LlmEndpointConfig = {
    val fromFile = envFile
      .filter(Files.exists(_))
      .map(p => parseEnvFile(Files.readString(p)))
      .getOrElse(Map.empty)
    def get(k: String): Option[String] =
      env.get(k).orElse(fromFile.get(k)).filter(_.nonEmpty)

    // prefer non-Azure API_KEY to avoid accidental Azure-mode activation
    val apiKey = get("API_KEY").orElse(get("AZURE_API_KEY")).getOrElse {
      throw new IllegalArgumentException(
        "API_KEY (or AZURE_API_KEY) environment variable is required.")
    }
    val azureMode = get("AZURE_API_KEY").isDefined && get("API_KEY").isEmpty
    val endpointBase = get("AZURE_ENDPOINT_BASE")
    if (endpointBase.isEmpty && azureMode)
      throw new IllegalArgumentException(
        "AZURE_ENDPOINT_BASE environment variable is required for Azure OpenAI.")
    LlmEndpointConfig(
      apiKey = apiKey,
      endpointBase = endpointBase,
      deploymentName = get("GPT4O_DEPLOYMENT_NAME").getOrElse(DefaultDeploymentName),
      apiVersion = get("AZURE_API_VERSION").getOrElse(DefaultApiVersion))
  }
}

/** E8: driver-side connectivity probe (`run_ai_connectivity_check_interactive`,
  * `setup_project.py:1511-1594`): a strict "reply exactly Status: OK" request
  * at temperature 0 / max_tokens 8; success iff the reply contains the marker.
  */
object ConnectivityProbe {
  val Marker = "Status: OK"

  def payload: LlmPayload = {
    val en = "This is a test. You must ONLY reply with the exact text 'Status: OK'. " +
      "Are you ready? Reply 'Status: OK' if you are ready."
    val sv = "Detta är ett test. Du måste ENDAST svara med exakt text 'Status: OK'. " +
      "Är du redo? Svara 'Status: OK' om du är redo."
    LlmPayload(
      Seq(
        LlmMessage("system", "You are a concise assistant for connectivity tests."),
        LlmMessage("user", s"$sv\n\n$en")),
      maxTokens = 8, temperature = 0.0)
  }

  def check(transport: LlmTransport): Boolean =
    try {
      val resp = transport.post(payload)
      resp.status == 200 && {
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        val content = m.readTree(resp.body)
          .path("choices").path(0).path("message").path("content").asText("")
        content.contains(Marker)
      }
    } catch { case _: Exception => false }
}
