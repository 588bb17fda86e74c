package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference doctests/tests for F3/F5/F6
  * (`src/program2_ai_processor.py:307-311`,
  * `src/program3_generate_website.py:236-238`,
  * `tests/test_program2_all.py:320,:435`).
  */
class TextCleanSpec extends AnyFunSuite {

  test("F3 fence-strip doctests") {
    assert(TextClean.cleanAiResponse("hello") == "hello")
    assert(TextClean.cleanAiResponse("```code```") == "code")
  }

  test("F3 language-tagged and multiline fences") {
    assert(TextClean.cleanAiResponse("```markdown\n# Title\nBody\n```") == "# Title\nBody")
    assert(TextClean.cleanAiResponse("```Markdown\ntext\n```") == "text")
    assert(TextClean.cleanAiResponse("  ```\nabc\n```  ") == "abc")
    assert(TextClean.cleanAiResponse("```python\nx = 1\n```") == "x = 1")
  }

  test("F3 fallback prefix/suffix stripping") {
    // prefix-only fence (no closing) → prefix stripped
    assert(TextClean.cleanAiResponse("```markdown body text") == "body text")
    assert(TextClean.cleanAiResponse("body text```") == "body text")
    assert(TextClean.cleanAiResponse("no fences at all") == "no fences at all")
    // partial-fence cases from tests/test_program2_all.py:435-447
    assert(TextClean.cleanAiResponse("```markdown\nHello").startsWith("Hello"))
    assert(TextClean.cleanAiResponse("```\nBye").startsWith("Bye"))
    assert(TextClean.cleanAiResponse("Hello```") == "Hello")
  }

  test("F6 html-clean doctest") {
    val raw = "<p>Title</p><p>  </p><p><br/></p><div>Content</div><br><br>"
    assert(TextClean.cleanHtmlOutput(raw) == "<p>Title</p><div>Content</div><br>")
  }

  test("F6 heading artifacts and whitespace collapse") {
    assert(TextClean.cleanHtmlOutput("<h2>T</h2>\n<p> </p><p>body</p>") == "<h2>T</h2><p>body</p>")
    // step 5 inserts \n after the heading, step 10 (>\s+<) collapses it again
    assert(TextClean.cleanHtmlOutput("<h2>T</h2><br/><p>x</p>") == "<h2>T</h2><p>x</p>")
    assert(TextClean.cleanHtmlOutput("a\n\n\n\n\nb") == "a\n\nb")
    assert(TextClean.cleanHtmlOutput("  <p>x</p>  ") == "<p>x</p>")
  }

  test("F5 markdown subset: headings, paragraphs, inline, lists") {
    val html = MarkdownHtml.markdownToHtml("## Skolan och eleverna\n\nEn **bra** skola med *trivsel*.\n\n- punkt ett\n- punkt två\n")
    assert(html.contains("<h2>Skolan och eleverna</h2>"))
    assert(html.contains("<p>En <strong>bra</strong> skola med <em>trivsel</em>.</p>"))
    assert(html.contains("<ul>\n<li>punkt ett</li>\n<li>punkt två</li>\n</ul>"))
  }

  test("F5 tables and fenced code") {
    val html = MarkdownHtml.markdownToHtml("| a | b |\n| --- | --- |\n| 1 | 2 |\n\n```\nx < y\n```")
    assert(html.contains("<table>"))
    assert(html.contains("<th>a</th>"))
    assert(html.contains("<td>1</td>"))
    assert(html.contains("<pre><code>x &lt; y\n</code></pre>"))
  }

  test("F5+F6 composition mirrors the program-3 conversion path") {
    val md = "## Resultat\n\nSkolan presterar **Över medel**.\n"
    val out = TextClean.cleanHtmlOutput(MarkdownHtml.markdownToHtml(md))
    assert(out == "<h2>Resultat</h2><p>Skolan presterar <strong>Över medel</strong>.</p>")
  }
}
