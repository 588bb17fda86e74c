package graft.functions

import scala.collection.mutable

/** Markdown → HTML (SURVEY.md §2.6 F5).
  *
  * The reference calls `markdown2.markdown(text, extras=["tables",
  * "fenced-code-blocks"])` (`src/program3_generate_website.py:199-202`). No
  * Markdown library ships on the offline Spark classpath, so this implements
  * the subset the AI output contract actually produces
  * (`data/templates/ai_prompt_template.txt:10-13`: `##` headings + prose,
  * with bold/italic/lists/tables/fenced code as possible artifacts).
  * Inter-tag whitespace differences vs markdown2 are immaterial because F6
  * (`TextClean.cleanHtmlOutput`) collapses `>\s+<` anyway.
  */
object MarkdownHtml {

  private def escapeCode(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Inline spans: bold, italic, inline code, links. */
  private[functions] def inline(s: String): String = {
    var r = s
    r = "`([^`]+)`".r.replaceAllIn(r, m => scala.util.matching.Regex.quoteReplacement(s"<code>${escapeCode(m.group(1))}</code>"))
    r = "\\*\\*([^*]+)\\*\\*".r.replaceAllIn(r, "<strong>$1</strong>")
    r = "(?<![*\\w])\\*([^*]+)\\*(?![*\\w])".r.replaceAllIn(r, "<em>$1</em>")
    r = "\\[([^\\]]+)\\]\\(([^)]+)\\)".r.replaceAllIn(r, "<a href=\"$2\">$1</a>")
    r
  }

  private val Heading = "^(#{1,6})\\s+(.*?)\\s*#*\\s*$".r
  private val Bullet = "^[-*]\\s+(.*)$".r
  private val Ordered = "^\\d+\\.\\s+(.*)$".r
  private val TableSep = "^\\s*\\|?\\s*:?-{3,}.*$".r

  def markdownToHtml(md: String): String = {
    val out = new mutable.StringBuilder
    val lines = md.split("\n", -1)
    var i = 0
    val para = mutable.ArrayBuffer.empty[String]

    def flushPara(): Unit = if (para.nonEmpty) {
      out.append("<p>").append(inline(para.mkString("\n"))).append("</p>\n\n")
      para.clear()
    }

    def cells(line: String): Seq[String] =
      line.stripPrefix("|").stripSuffix("|").split("\\|", -1).toSeq.map(_.trim)

    while (i < lines.length) {
      val line = lines(i)
      line match {
        case _ if line.startsWith("```") =>
          flushPara()
          val code = mutable.ArrayBuffer.empty[String]
          i += 1
          while (i < lines.length && !lines(i).startsWith("```")) {
            code += lines(i); i += 1
          }
          out.append("<pre><code>").append(escapeCode(code.mkString("\n")))
            .append("\n</code></pre>\n\n")
        case Heading(hashes, text) =>
          flushPara()
          val n = hashes.length
          out.append(s"<h$n>").append(inline(text)).append(s"</h$n>\n\n")
        case _ if line.trim.startsWith("|") && i + 1 < lines.length &&
            TableSep.matches(lines(i + 1).trim) && lines(i + 1).trim.startsWith("|") =>
          flushPara()
          out.append("<table>\n<thead>\n<tr>\n")
          cells(line.trim).foreach(c => out.append("<th>").append(inline(c)).append("</th>\n"))
          out.append("</tr>\n</thead>\n<tbody>\n")
          i += 2
          while (i < lines.length && lines(i).trim.startsWith("|")) {
            out.append("<tr>\n")
            cells(lines(i).trim).foreach(c => out.append("<td>").append(inline(c)).append("</td>\n"))
            out.append("</tr>\n")
            i += 1
          }
          i -= 1
          out.append("</tbody>\n</table>\n\n")
        case Bullet(_) =>
          flushPara()
          out.append("<ul>\n")
          while (i < lines.length && Bullet.matches(lines(i))) {
            val Bullet(item) = lines(i): @unchecked
            out.append("<li>").append(inline(item)).append("</li>\n")
            i += 1
          }
          i -= 1
          out.append("</ul>\n\n")
        case Ordered(_) =>
          flushPara()
          out.append("<ol>\n")
          while (i < lines.length && Ordered.matches(lines(i))) {
            val Ordered(item) = lines(i): @unchecked
            out.append("<li>").append(inline(item)).append("</li>\n")
            i += 1
          }
          i -= 1
          out.append("</ol>\n\n")
        case _ if line.trim.isEmpty =>
          flushPara()
        case _ =>
          para += line
      }
      i += 1
    }
    flushPara()
    out.result().stripTrailing() + "\n"
  }
}
