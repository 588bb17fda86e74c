package graft.core

/** Constants mirroring the reference's configuration surface
  * (`/root/reference/src/config.py:76-117`). Only the engine-relevant values
  * are reproduced; paths are parameters of the jobs, not globals.
  */
object RefConfig {
  /** `src/config.py:79` */
  val MissingDataPlaceholder = "[Data Saknas]"

  /** `src/config.py:80` — newest year first. */
  val SurveyYearSuffixes: Seq[String] = Seq("_2023/2024", "_2022/2023")

  /** `src/config.py:85-87` */
  val AiProcessedSuffix = "_ai_description.md"
  val AiRawResponseSuffix = "_gpt4o_response.json"
  val AiFailedResponseSuffix = "_gpt4o_FAILED_response.json"

  /** `src/config.py:91-100` — enrichment operator knobs. */
  val MaxConcurrentRequests = 250
  val TargetRpm = 10000
  val MaxRetries = 3
  val BackoffFactor = 2.0
  val RetrySleepOn429Seconds = 60
  val Temperature = 0.10
  val RequestTimeoutSeconds = 300
  val AiPayloadMaxTokens = 2048

  /** `src/config.py:107-111` */
  val FallbackSchoolNameFormat = "School (Code: %s)"
  val FallbackDescriptionHtml = "<p><em>Description not available for this school.</em></p>"
  val ErrorDescriptionHtml = "<p><em>Error loading description.</em></p>"

  /** `src/config.py:112-117` */
  val NoDataHtml: String =
    "<!DOCTYPE html><html lang=\"en\"><head><meta charset=\"UTF-8\">" +
      "<title>School Information</title>" +
      "<style>body{font-family: sans-serif; text-align: center; padding: 50px;}</style></head>" +
      "<body><h1>School Information</h1><p>No school data is available to display.</p></body></html>"
}
