package graft.pipeline

import graft.SparkSpec
import graft.operators.FirstWinsDedup

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** End-to-end pipeline specs mirroring the reference's integration test
  * (`tests/test_integration_pipeline.py:38-85`) and program-level fixtures
  * (`tests/test_program1_all.py:54-62`, `tests/test_program3_all.py:112-131`).
  */
class PipelineSpec extends SparkSpec {

  private def tmpDir(prefix: String) = Files.createTempDirectory(prefix).toString
  private def write(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
  }
  private def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)

  test("MarkdownJob: renders one file per row, skips missing SchoolCode") {
    val dir = tmpDir("mdjob")
    write(s"$dir/data.csv",
      "SchoolCode;SchoolName;Score\nA100;Alpha;10.0\n;NoCode;5\nB200;Beta;31.6\n")
    write(s"$dir/tpl.md", "# {SchoolName}\nCode: {SchoolCode}\nScore: {Score}\nMissing: {Nope}\n")
    val out = s"$dir/out"
    val res = MarkdownJob.run(spark, s"$dir/data.csv", s"$dir/tpl.md", out)
    assert(res.written == 2)
    assert(read(s"$out/A100.md") == "# Alpha\nCode: A100\nScore: 10\nMissing: [Data Saknas]\n")
    assert(read(s"$out/B200.md") == "# Beta\nCode: B200\nScore: 31.6\nMissing: [Data Saknas]\n")
    assert(!Files.exists(Paths.get(s"$out/.md")))
  }

  test("MarkdownJob: template without placeholders fails (reference ValueError)") {
    val dir = tmpDir("mdjob2")
    write(s"$dir/data.csv", "SchoolCode\nA\n")
    write(s"$dir/tpl.md", "static text only")
    intercept[IllegalArgumentException] {
      MarkdownJob.run(spark, s"$dir/data.csv", s"$dir/tpl.md", s"$dir/out")
    }
  }

  test("MarkdownJob: empty CSV renders nothing") {
    val dir = tmpDir("mdjob3")
    write(s"$dir/data.csv", "SchoolCode;SchoolName\n")
    write(s"$dir/tpl.md", "{SchoolName}")
    assert(MarkdownJob.run(spark, s"$dir/data.csv", s"$dir/tpl.md", s"$dir/out").written == 0)
  }

  test("MarkdownJob: duplicate SchoolCode -> LAST row in file order wins the file") {
    // Reference overwrites `{code}.md` per row in file order
    // (`program1_generate_markdowns.py:382-388`); under local[32] this must
    // stay deterministic, not an arbitrary-task rename race.
    val dir = tmpDir("mdjob_dup")
    val dupRows = (1 to 40).map(i => s"D500;Version $i").mkString("\n")
    write(s"$dir/data.csv", s"SchoolCode;SchoolName\n$dupRows\nE600;Solo\n")
    write(s"$dir/tpl.md", "{SchoolName}")
    val out = s"$dir/out"
    val res = MarkdownJob.run(spark, s"$dir/data.csv", s"$dir/tpl.md", out)
    assert(res.written == 2)
    assert(read(s"$out/D500.md") == "Version 40")
    assert(read(s"$out/E600.md") == "Solo")
  }

  test("FirstWinsDedup keeps the first instance in file order") {
    import spark.implicits._
    val df = Seq(("A", "Alpha", 0L), ("A", "Alpha Again", 1L), ("B", "", 2L))
      .toDF("SchoolCode", "SchoolName", "_file_order")
    val got = FirstWinsDedup(df, Seq("SchoolCode"), "_file_order")
      .orderBy($"_file_order").select($"SchoolName").as[String].collect().toSeq
    assert(got == Seq("Alpha", ""))
  }

  test("SiteJob end-to-end: dedup, fallback name, join, fallback html, sort") {
    val dir = tmpDir("site")
    write(s"$dir/data.csv",
      "SchoolCode;SchoolName\nA100;Alpha\nB200;\nA100;Alpha Dup\nC300;Celsius\n")
    write(s"$dir/md/A100_ai_description.md", "**AI**: Alpha is great!")
    write(s"$dir/md/C300_ai_description.md", "## Resultat\n\nBra skola.")
    write(s"$dir/site.html", "<html><body>{school_list_json}</body></html>")
    val res = SiteJob.run(spark, s"$dir/data.csv", s"$dir/md", s"$dir/site.html",
      s"$dir/out/index.html")
    assert(res.schools == 3)
    val html = read(s"$dir/out/index.html")
    assert(html.contains("Alpha is great!"))
    assert(!html.contains("Alpha Dup"))
    assert(html.contains("School (Code: B200)")) // P8 fallback name
    assert(html.contains("Description not available")) // J1 miss fallback
    assert(html.contains("<h2>Resultat</h2><p>Bra skola.</p>"))
    // O2: sorted by name — Alpha < Celsius < School (Code: B200)
    val iAlpha = html.indexOf("\"name\": \"Alpha\"")
    val iCels = html.indexOf("\"name\": \"Celsius\"")
    val iFall = html.indexOf("\"name\": \"School (Code: B200)\"")
    assert(iAlpha >= 0 && iAlpha < iCels && iCels < iFall)
  }

  test("ArtifactReset: run -> reset -> run round-trips, inputs untouched") {
    val dir = tmpDir("reset")
    write(s"$dir/data.csv", "SchoolCode;SchoolName\nA100;Alpha\nB200;Beta\n")
    write(s"$dir/tpl.md", "# {SchoolName}")
    val out = s"$dir/generated_markdown_from_csv"
    val r1 = MarkdownJob.run(spark, s"$dir/data.csv", s"$dir/tpl.md", out)
    write(s"$dir/output/sub/index.html", "<html/>") // nested artifact
    assert(r1.written == 2)

    val deleted = ArtifactReset.reset(dir)
    assert(deleted == 3) // 2 markdowns + index.html
    assert(!Files.exists(Paths.get(out, "A100.md")))
    assert(!Files.exists(Paths.get(s"$dir/output/sub"))) // emptied subdir pruned
    assert(Files.exists(Paths.get(s"$dir/data.csv"))) // inputs are not artifacts
    assert(ArtifactReset.reset(dir) == 0) // idempotent

    val r2 = MarkdownJob.run(spark, s"$dir/data.csv", s"$dir/tpl.md", out)
    assert(r2.written == 2)
    assert(read(s"$out/A100.md") == "# Alpha")
  }

  test("SiteJob: no data -> NO_DATA page (K4)") {
    val dir = tmpDir("site2")
    write(s"$dir/data.csv", "SchoolCode;SchoolName\n;OnlyMissing\n")
    write(s"$dir/site.html", "{school_list_json}")
    val res = SiteJob.run(spark, s"$dir/data.csv", s"$dir/md-none", s"$dir/site.html",
      s"$dir/out/index.html")
    assert(res.schools == 0)
    assert(read(s"$dir/out/index.html").contains("No school data is available"))
  }
}
