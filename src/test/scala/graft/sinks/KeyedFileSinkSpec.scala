package graft.sinks

import graft.SparkSpec

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** K1/K2 sink hardening: data-derived keys must not escape the output
  * directory (keys come straight from CSV SchoolCode values), and validation
  * is purely lexical — a non-ASCII key (Swedish school names) must never be
  * rejected or dropped on encoding grounds (reference parity:
  * `src/program1_generate_markdowns.py:382-388` writes such filenames).
  */
class KeyedFileSinkSpec extends SparkSpec {
  import spark.implicits._

  test("safeKey rejects traversal, separators and NUL; accepts plain and non-ASCII names") {
    assert(KeyedFileSink.safeKey("A100.md"))
    assert(KeyedFileSink.safeKey("skola åäö 12.json"))
    assert(KeyedFileSink.safeKey("..md")) // legal in-dir name, not a traversal
    assert(!KeyedFileSink.safeKey("../evil.md"))
    assert(!KeyedFileSink.safeKey("a/b.md"))
    assert(!KeyedFileSink.safeKey("a\\b.md"))
    assert(!KeyedFileSink.safeKey(".."))
    assert(!KeyedFileSink.safeKey("."))
    assert(!KeyedFileSink.safeKey("x\u0000y.md"))
    assert(!KeyedFileSink.safeKey("/etc/passwd"))
    assert(!KeyedFileSink.safeKey(""))
  }

  test("write skips unsafe keys and never writes outside outDir") {
    val parent = Files.createTempDirectory("sink_safe")
    val out = parent.resolve("out").toString
    val df = Seq(
      ("GOOD1", "fine"),
      ("../escape", "evil"),
      ("sub/dir", "evil"),
      ("..", "evil")).toDF("k", "v")
    // the raw key ".." is validated BEFORE the suffix is appended, so it is
    // rejected even though ".." + ".md" == "..md" would be a legal filename
    val written = KeyedFileSink.write(df, "k", "v", out, ".md")
    assert(written == 1)
    assert(Files.exists(Paths.get(out, "GOOD1.md")))
    assert(!Files.exists(parent.resolve("escape.md")))
    // nothing but the good file (and no stray temp files) in the tree
    val all = Files.walk(parent).filter(Files.isRegularFile(_))
      .map[String](_.getFileName.toString).toArray.toSeq
    assert(all == Seq("GOOD1.md"))
  }

  test("exactly-once under task retries: attempt-0 crash mid-partition leaves " +
      "no torn, missing or duplicate files") {
    // The test session runs local[4, 2] (one retry). A udf crashes the FIRST
    // attempt of two of the four tasks partway through their row stream —
    // after some files are already renamed into place — then the retry
    // replays the whole partition. Exactly-once here means: every key's file
    // exists with its full content (last rename wins, content deterministic
    // per key), no temp droppings are visible afterwards, and the written
    // accumulator counts only the successful attempts.
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("sink_retry").resolve("out").toString
    val n = 40
    val crashOnFirstAttempt = udf { (k: String) =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 && k.toLong % 20 == 19)
        throw new RuntimeException("injected task failure (spec)")
      k
    }
    val df = spark.range(0, n).select(
      crashOnFirstAttempt(col("id").cast("string")).as("k"),
      concat(lit("content-"), col("id")).as("v"))
    val written = KeyedFileSink.write(df, "k", "v", out, ".md")
    assert(written == n, s"accumulator double- or under-counted: $written")
    val files = new java.io.File(out).listFiles().map(_.getName).toSeq
    assert(files.count(_.endsWith(".md")) == n, s"expected $n files, got $files")
    assert(!files.exists(_.contains(".tmp")), s"temp droppings visible: $files")
    for (i <- 0 until n) {
      val content = new String(
        Files.readAllBytes(Paths.get(out, s"$i.md")), StandardCharsets.UTF_8)
      assert(content == s"content-$i", s"torn write for key $i: '$content'")
    }
  }

  test("write physically writes files for non-ASCII keys") {
    val parent = Files.createTempDirectory("sink_utf8")
    val out = parent.resolve("out").toString
    val key = "skola åäö 12"
    val df = Seq((key, "svensk skola éü")).toDF("k", "v")
    val written = KeyedFileSink.write(df, "k", "v", out, ".md")
    assert(written == 1)
    val target = Paths.get(out).resolve(key + ".md")
    assert(Files.exists(target))
    val content = new String(Files.readAllBytes(target), StandardCharsets.UTF_8)
    assert(content == "svensk skola éü")
  }
}
