package graft.functions

import java.util.regex.Pattern

/** Fence stripping and HTML cleanup (SURVEY.md §2.6 F3/F6).
  *
  * Reference semantics: `_clean_ai_response`
  * (`src/program2_ai_processor.py:292-326`) and `clean_html_output`
  * (`src/program3_generate_website.py:212-259`) — the exact 3-step fallback
  * order and 9-substitution sequence are preserved.
  *
  * These are plain Scala functions; the data plane wraps them in UDFs (they
  * run on already-reduced, per-document strings — not the hot relational
  * path).
  */
object TextClean {

  private val FencePattern = Pattern.compile(
    "^\\s*```(?:[a-zA-Z0-9]+\\s*\\n)?(.*?)\\n?```\\s*$",
    Pattern.DOTALL | Pattern.CASE_INSENSITIVE)

  /** F3: strip markdown code fences from LLM output. */
  def cleanAiResponse(content: String): String = {
    var cleaned = content.strip()
    val m = FencePattern.matcher(cleaned)
    if (m.matches()) return m.group(1).strip()
    if (cleaned.startsWith("```markdown"))
      cleaned = cleaned.substring("```markdown".length).stripLeading()
    else if (cleaned.startsWith("```"))
      cleaned = cleaned.substring("```".length).stripLeading()
    if (cleaned.endsWith("```"))
      cleaned = cleaned.substring(0, cleaned.length - "```".length).stripTrailing()
    cleaned
  }

  /** F6: the reference's 9 sequential regex substitutions + strip. */
  def cleanHtmlOutput(html: String): String = {
    require(html != null, "Input must be a string.")
    var h = html
    h = h.replaceAll("<p>\\s*</p>", "")
    h = h.replaceAll("<p>&nbsp;</p>", "")
    h = h.replaceAll("<p><br\\s*/?>\\s*</p>", "")
    h = h.replaceAll("(<h[1-6][^>]*>.*?</h[1-6]>)\\s*<p>\\s*</p>", "$1")
    h = h.replaceAll("(<h[1-6][^>]*>.*?</h[1-6]>)\\s*<br\\s*/?>\\s*", "$1\n")
    h = h.replaceAll("(<br\\s*/?>\\s*){2,}", "<br>")
    h = h.replaceAll("(<h[1-6][^>]*>.*?</h[1-6]>)\\s*<br\\s*/?>", "$1")
    h = h.replaceAll("<p>\\s*<br\\s*/?>\\s*</p>", "")
    h = h.replaceAll("\\n\\s*\\n\\s*\\n+", "\n\n")
    h = h.replaceAll(">\\s+<", "><")
    h.strip()
  }
}
