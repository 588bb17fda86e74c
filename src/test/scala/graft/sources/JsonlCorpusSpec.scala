package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class JsonlCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "id BIGINT, name STRING, score DOUBLE"

  private def stage(lines: String*): String = {
    val dir = Files.createTempDirectory("jsonl")
    Files.write(dir.resolve("part-0.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("readWithQuarantine: one bad line never fails the job; raw line preserved") {
    val path = stage(
      """{"id":1,"name":"alpha","score":0.5}""",
      """{"id":2,"name":"beta""",              // truncated
      """{"id":3,"name":"gamma","score":1.5}""",
      """not json at all""")
    val (good, quarantine) = JsonlCorpus.readWithQuarantine(spark, path, ddl)
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(!good.columns.contains(JsonlCorpus.CorruptCol))
    val raw = quarantine.select(JsonlCorpus.CorruptCol).as[String].collect().toSet
    assert(raw == Set("""{"id":2,"name":"beta""", "not json at all"))
  }

  test("corrupt rows normalize fields to null; the raw line carries the forensics") {
    val path = stage("""{"id":7,"name":"x" BROKEN""")
    val (_, quarantine) = JsonlCorpus.readWithQuarantine(spark, path, ddl)
    val row = quarantine.collect().head
    assert(row.getString(row.fieldIndex(JsonlCorpus.CorruptCol)) ==
      """{"id":7,"name":"x" BROKEN""")
    assert(row.isNullAt(row.fieldIndex("id")), "no partial parses on the corrupt side")
  }

  test("blank lines are skipped, not quarantined") {
    val path = stage("""{"id":1,"name":"a","score":1.0}""", "", "   ",
      """{"id":2,"name":"b","score":2.0}""")
    val (good, quarantine) = JsonlCorpus.readWithQuarantine(spark, path, ddl)
    assert(good.count() == 2 && quarantine.count() == 0)
  }

  test("parseLines normalizes fields to null on corrupt rows and flags them") {
    val df = Seq(
      (1L, """{"id":1,"name":"a","score":2.0}"""),
      (2L, """{"id":2,"nam"""),
      (3L, """{"id":3,"name":"c","score":-1.0}""")).toDF("row", "line")
    val got = JsonlCorpus.parseLines(df, col("line"), ddl)
      .orderBy("row")
      .select("row", "id", "name", "is_corrupt")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "" else r.getString(2), r.getBoolean(3))).toSeq
    assert(got == Seq(
      (1L, 1L, "a", false),
      (2L, -1L, "", true),
      (3L, 3L, "c", false)))
  }

  test("writeJsonl -> read round-trips losslessly, including null fields") {
    val dir = Files.createTempDirectory("jsonl_rt").resolve("out").toString
    val src = Seq(
      (1L, Some("alpha"), Some(0.5)),
      (2L, None: Option[String], Some(2.5)),
      (3L, Some("gamma"), None: Option[Double])).toDF("id", "name", "score")
    graft.sinks.DataSinks.writeJsonl(src, dir, shards = 2)
    val (good, quarantine) = JsonlCorpus.readWithQuarantine(spark, dir, ddl)
    assert(quarantine.count() == 0, "a writer-produced corpus must be fully valid")
    assert(good.exceptAll(src).isEmpty && src.exceptAll(good).isEmpty)
    // shard count is what was asked for
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith("part-")).count()
    assert(files == 2, s"expected 2 shards, got $files")
  }

  test("good-path scan supports column pruning and predicate pushdown semantics") {
    val path = stage(
      """{"id":1,"name":"alpha","score":0.5}""",
      """{"id":2,"name":"beta","score":9.0}""")
    val (good, _) = JsonlCorpus.readWithQuarantine(spark, path, ddl)
    val got = good.where(col("score") > 1.0).select("name").as[String].collect().toSeq
    assert(got == Seq("beta"))
  }
}
