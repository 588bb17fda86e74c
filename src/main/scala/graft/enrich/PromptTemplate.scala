package graft.enrich

import graft.core.RefConfig

/** F4 prompt build (`_parse_prompt_template`,
  * `src/program2_ai_processor.py:253-290`): substitute `{school_data}`, then
  * split on `SYSTEM:` / `USER:` markers into a two-message chat payload.
  * Missing markers → IllegalArgumentException (reference ValueError).
  */
object PromptTemplate {

  def buildPayload(promptTemplate: String, schoolData: String,
      maxTokens: Int = RefConfig.AiPayloadMaxTokens,
      temperature: Double = RefConfig.Temperature): LlmPayload = {
    val filled = promptTemplate.replace("{school_data}", schoolData)
    val systemStart = filled.indexOf("SYSTEM:")
    val userStart = filled.indexOf("USER:")
    require(systemStart != -1 && userStart != -1,
      "Prompt template must contain 'SYSTEM:' and 'USER:' markers.")
    val systemContent = filled.substring(systemStart + "SYSTEM:".length, userStart).strip()
    val userContent = filled.substring(userStart + "USER:".length).strip()
    LlmPayload(
      Seq(LlmMessage("system", systemContent), LlmMessage("user", userContent)),
      maxTokens, temperature)
  }
}
