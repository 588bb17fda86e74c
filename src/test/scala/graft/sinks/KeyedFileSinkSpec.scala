package graft.sinks

import graft.SparkSpec

import java.nio.file.{Files, Paths}

/** K1/K2 sink hardening: data-derived keys must not escape the output
  * directory (keys come straight from CSV SchoolCode values).
  */
class KeyedFileSinkSpec extends SparkSpec {
  import spark.implicits._

  test("safeKey rejects traversal, separators and NUL; accepts plain names") {
    val dir = Paths.get("/tmp/out").toAbsolutePath.normalize()
    assert(KeyedFileSink.safeKey(dir, "A100.md"))
    assert(KeyedFileSink.safeKey(dir, "skola åäö 12.json"))
    assert(!KeyedFileSink.safeKey(dir, "../evil.md"))
    assert(!KeyedFileSink.safeKey(dir, "a/b.md"))
    assert(!KeyedFileSink.safeKey(dir, "a\\b.md"))
    assert(!KeyedFileSink.safeKey(dir, ".."))
    assert(!KeyedFileSink.safeKey(dir, "."))
    assert(!KeyedFileSink.safeKey(dir, "x\u0000y.md"))
    assert(!KeyedFileSink.safeKey(dir, "/etc/passwd"))
  }

  test("write skips unsafe keys and never writes outside outDir") {
    val parent = Files.createTempDirectory("sink_safe")
    val out = parent.resolve("out").toString
    val df = Seq(
      ("GOOD1", "fine"),
      ("../escape", "evil"),
      ("sub/dir", "evil"),
      ("..", "evil")).toDF("k", "v")
    val written = KeyedFileSink.write(df, "k", "v", out, ".md")
    assert(written == 1)
    assert(Files.exists(Paths.get(out, "GOOD1.md")))
    assert(!Files.exists(parent.resolve("escape.md")))
    // nothing but the good file (and no stray temp files) in the tree
    val all = Files.walk(parent).filter(Files.isRegularFile(_))
      .map[String](_.getFileName.toString).toArray.toSeq
    assert(all == Seq("GOOD1.md"))
  }
}
