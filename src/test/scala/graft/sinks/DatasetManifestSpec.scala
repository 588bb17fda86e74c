package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}

class DatasetManifestSpec extends SparkSpec {
  import spark.implicits._

  test("manifest: inventory matches the filesystem and an independent digest") {
    val dir = Files.createTempDirectory("manifest_ds").toString + "/ds"
    val df = (1L to 200L).map(i => (i, s"doc$i", i % 5)).toDF("id", "text", "shard")
    df.write.partitionBy("shard").parquet(dir)

    val m = DatasetManifest.write(spark, dir)
    assert(m.agg(sum($"rows")).head().getLong(0) == 200L)
    assert(m.count() >= 5L) // at least one part file per partition dir
    val first = m.orderBy($"file").head()
    val p = Paths.get(dir, first.getString(0))
    assert(Files.size(p) == first.getLong(1))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
    assert(md == first.getString(3), "digest must match an independent md5")
    // per-file row counts come from the real scan, not trust
    val byFile = spark.read.parquet(dir)
      .groupBy(input_file_name()).count().select($"count").as[Long]
      .collect().sorted.toSeq
    assert(m.select($"rows").as[Long].collect().sorted.toSeq == byFile)
    // the stored _manifest hides from parquet discovery: writing it
    // changed nothing about what the dataset reads as, and it never
    // lists itself
    assert(spark.read.parquet(dir).count() == 200L)
    assert(!m.select($"file").as[String].collect().exists(_.contains("_manifest")))
  }

  test("verify: ok on a clean release; changed/missing/extra each surface") {
    val dir = Files.createTempDirectory("manifest_v").toString + "/ds"
    (1L to 120L).map(i => (i, s"t$i")).toDF("id", "text")
      .repartition(4).write.parquet(dir)
    val m = DatasetManifest.write(spark, dir)
    val files = m.select($"file").as[String].collect().sorted
    assert(files.length == 4)

    val v0 = DatasetManifest.verify(spark, dir)
    assert(v0.count() == 4 && v0.where($"status" =!= "ok").count() == 0,
      v0.collect().mkString(","))

    // changed: one appended byte tears the parquet footer AND moves the
    // digest — verify must keep working (the rows scan skips the torn
    // file, the binary side still reads it) and flag exactly that file
    Files.write(Paths.get(dir, files.head), Array[Byte](0x7f),
      StandardOpenOption.APPEND)
    // drop Hadoop's local-FS checksum sidecar: a real tamper/replacement
    // doesn't ship a stale .crc, and with one present the local FS throws
    // ChecksumException before either scan can report the file
    Files.deleteIfExists(Paths.get(dir, "." + files.head + ".crc"))
    // missing: a part file the release shipped is gone
    Files.delete(Paths.get(dir, files.last))
    // extra: a stray parquet the release never listed
    Files.copy(Paths.get(dir, files(1)), Paths.get(dir, "part-stray.parquet"))

    val v = DatasetManifest.verify(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v(files.head) == "changed", v.toString)
    assert(v(files.last) == "missing", v.toString)
    assert(v("part-stray.parquet") == "extra", v.toString)
    assert(v(files(1)) == "ok" && v(files(2)) == "ok", v.toString)
    // severity order: problems first, ok rows last
    val statuses = DatasetManifest.verify(spark, dir)
      .select($"status").as[String].collect().toSeq
    assert(statuses.take(3).toSet == Set("missing", "changed", "extra"))
    assert(statuses.drop(3).forall(_ == "ok"))
  }

  test("verify tiers: quick binds structure without reading data; only full catches a same-length flip") {
    val dir = Files.createTempDirectory("manifest_q").toString + "/ds"
    (1L to 120L).map(i => (i, s"t$i")).toDF("id", "text")
      .repartition(4).write.parquet(dir)
    DatasetManifest.write(spark, dir)
    val files = DatasetManifest.manifest(spark, dir, withMd5 = false)
      .select($"file").as[String].collect().sorted
    // clean release: quick all-ok, and its actual side carries NO digest —
    // the proof it never streamed the data
    val q0 = DatasetManifest.verify(spark, dir, mode = "quick")
    assert(q0.where($"status" =!= "ok").count() == 0)
    assert(q0.where($"md5_actual".isNotNull).count() == 0)

    // structural damage — truncation, a missing part, a stray part — is
    // exactly what quick exists to catch
    val t = Paths.get(dir, files.head)
    Files.write(t, Files.readAllBytes(t).dropRight(1))
    Files.deleteIfExists(Paths.get(dir, "." + files.head + ".crc"))
    Files.delete(Paths.get(dir, files.last))
    Files.copy(Paths.get(dir, files(1)), Paths.get(dir, "part-stray.parquet"))
    val q = DatasetManifest.verify(spark, dir, mode = "quick").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(q(files.head) == "changed", q.toString)
    assert(q(files.last) == "missing", q.toString)
    assert(q("part-stray.parquet") == "extra", q.toString)

    // a LENGTH-PRESERVING flip in the page bytes: same size, same footer —
    // quick provably cannot see it; the full digest must
    val dir2 = Files.createTempDirectory("manifest_q2").toString + "/ds"
    (1L to 120L).map(i => (i, s"t$i")).toDF("id", "text")
      .repartition(2).write.parquet(dir2)
    DatasetManifest.write(spark, dir2)
    val f2 = DatasetManifest.manifest(spark, dir2, withMd5 = false)
      .select($"file").as[String].collect().sorted.head
    val p2 = Paths.get(dir2, f2)
    val bytes = Files.readAllBytes(p2)
    bytes(bytes.length / 3) = (bytes(bytes.length / 3) ^ 0xFF).toByte
    Files.write(p2, bytes)
    Files.deleteIfExists(Paths.get(dir2, "." + f2 + ".crc"))
    assert(DatasetManifest.verify(spark, dir2, mode = "quick")
      .where($"status" =!= "ok").count() == 0,
      "quick must pass a same-length flip (documented limit)")
    val full = DatasetManifest.verify(spark, dir2, mode = "full").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(full(f2) == "changed", full.toString)
  }
}
