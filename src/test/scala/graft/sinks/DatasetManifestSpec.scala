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

  test("sampled tier: catches the same-length flip quick misses — certainty on small parts, " +
      "keyed-page coverage on large ones — without streaming every byte") {
    // small parts (< 4×64 KiB): pagesig covers ALL content, so the exact
    // flip the quick tier provably passes is CAUGHT at ~the same read cost
    val dir = Files.createTempDirectory("manifest_s").toString + "/ds"
    (1L to 120L).map(i => (i, s"t$i")).toDF("id", "text")
      .repartition(2).write.parquet(dir)
    DatasetManifest.write(spark, dir)
    val f = DatasetManifest.manifest(spark, dir, withMd5 = false,
        withPages = false)
      .select($"file").as[String].collect().sorted.head
    val p = Paths.get(dir, f)
    val bytes = Files.readAllBytes(p)
    bytes(bytes.length / 3) = (bytes(bytes.length / 3) ^ 0xFF).toByte
    Files.write(p, bytes)
    Files.deleteIfExists(Paths.get(dir, "." + f + ".crc"))
    assert(DatasetManifest.verify(spark, dir, mode = "quick")
      .where($"status" =!= "ok").count() == 0, "quick's documented blind spot")
    val s = DatasetManifest.verify(spark, dir, mode = "sampled").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(s(f) == "changed", s.toString)
    // the sampled actual side computed pagesig but never the md5 — the
    // proof it did not stream the release
    val sv = DatasetManifest.verify(spark, dir, mode = "sampled")
    assert(sv.where($"md5_actual".isNotNull).count() == 0)
    assert(sv.where($"pagesig_actual".isNull).count() == 0)

    // a pre-pagesig manifest cannot serve the sampled tier — loud, with
    // the re-seal instruction, never a silent all-changed
    val old = Files.createTempDirectory("manifest_s2").toString + "/ds"
    (1L to 40L).map(i => (i, s"t$i")).toDF("id", "text")
      .coalesce(1).write.parquet(old)
    // a genuinely pre-pagesig-era manifest: the COLUMN does not exist
    DatasetManifest.manifest(spark, old).drop("pagesig").coalesce(1)
      .write.mode("overwrite").parquet(s"$old/_manifest")
    val err = intercept[IllegalArgumentException] {
      DatasetManifest.verify(spark, old, mode = "sampled")
    }
    assert(err.getMessage.contains("re-seal"), err.getMessage)
    // and the legacy tiers keep working on it
    assert(DatasetManifest.verify(spark, old, mode = "full")
      .where($"status" =!= "ok").count() == 0)
  }

  test("append: seal + grow + append equals a fresh full seal, digests only the delta, " +
      "and tamper drills hold across generations") {
    val dir = Files.createTempDirectory("manifest_a").toString + "/ds"
    (1L to 60L).map(i => (i, s"v1_$i")).toDF("id", "text")
      .repartition(2).write.parquet(dir)
    val m1 = DatasetManifest.write(spark, dir)
    val gen1 = m1.select($"file").as[String].collect().toSet
    assert(gen1.size == 2)

    // the release GROWS: two more part files land beside the sealed ones
    (61L to 120L).map(i => (i, s"v2_$i")).toDF("id", "text")
      .repartition(2).write.mode("append").parquet(dir)
    val m2 = DatasetManifest.append(spark, dir)
    assert(m2.count() == 4)

    // entry-for-entry what a fresh full seal would record — same files,
    // bytes, rows, digests, page signatures, same order
    val appended = m2.orderBy($"file").collect().toSeq
    val fresh = DatasetManifest.manifest(spark, dir).collect().toSeq
    assert(appended == fresh,
      s"append-grown manifest differs from a fresh seal:\n$appended\nvs\n$fresh")

    // verify across both generations: clean release reads all-ok at
    // every tier
    for (mode <- Seq("full", "sampled", "quick"))
      assert(DatasetManifest.verify(spark, dir, mode = mode)
        .where($"status" =!= "ok").count() == 0, mode)

    // appending with no new files is a no-op re-write
    assert(DatasetManifest.append(spark, dir).orderBy($"file")
      .collect().toSeq == appended)

    // tamper one OLD-generation and one NEW-generation file: the drills
    // must flag both (the appended manifest binds both generations)
    val files = appended.map(_.getString(0))
    val oldF = files.find(gen1).get
    val newF = files.find(f => !gen1(f)).get
    for (f <- Seq(oldF, newF)) {
      val p = Paths.get(dir, f)
      val b = Files.readAllBytes(p)
      b(b.length / 2) = (b(b.length / 2) ^ 0xFF).toByte
      Files.write(p, b)
      Files.deleteIfExists(Paths.get(dir, "." + f + ".crc"))
    }
    val v = DatasetManifest.verify(spark, dir, mode = "full").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v(oldF) == "changed" && v(newF) == "changed", v.toString)

    // missing + extra across generations
    Files.delete(Paths.get(dir, newF))
    Files.copy(Paths.get(dir, oldF), Paths.get(dir, "part-stray.parquet"))
    val v2 = DatasetManifest.verify(spark, dir, mode = "quick").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v2(newF) == "missing" && v2("part-stray.parquet") == "extra",
      v2.toString)
  }

  test("a crashed append swap (only _manifest.old on disk) self-heals at every entry point") {
    // append commits via replaceDir; a crash between its two renames
    // leaves no _manifest but a complete _manifest.old. Without a heal,
    // hasManifest reads false (shard readers silently SKIP the integrity
    // gate) and a retried append fails its own require.
    val dir = Files.createTempDirectory("manifest_heal").toString + "/ds"
    (1L to 30L).map(i => (i, s"v$i")).toDF("id", "text")
      .coalesce(1).write.parquet(dir)
    DatasetManifest.write(spark, dir)

    def crash(): Unit = graft.operators.IndexFs
      .rename(s"$dir/_manifest", s"$dir/_manifest.old")

    crash()
    assert(DatasetManifest.hasManifest(spark, dir),
      "hasManifest must roll the crashed swap forward, not report no-manifest")
    crash()
    assert(DatasetManifest.verify(spark, dir, mode = "quick")
      .where($"status" =!= "ok").count() == 0)
    crash()
    (31L to 40L).map(i => (i, s"v$i")).toDF("id", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    assert(DatasetManifest.append(spark, dir).count() == 2,
      "a retried append after the crash window must succeed")
    assert(!graft.operators.IndexFs.exists(s"$dir/_manifest.old"))
  }

  test("sampled tier degrades null-pagesig entries (appended onto a pre-pagesig seal) " +
      "to quick semantics instead of failing a healthy release") {
    val dir = Files.createTempDirectory("manifest_nps").toString + "/ds"
    (1L to 40L).map(i => (i, s"g1_$i")).toDF("id", "text")
      .coalesce(1).write.parquet(dir)
    // a pre-pagesig-ERA seal: the column never existed
    DatasetManifest.manifest(spark, dir).drop("pagesig").coalesce(1)
      .write.parquet(s"$dir/_manifest")
    // the release grows; append carries the legacy entry with pagesig=null
    (41L to 60L).map(i => (i, s"g2_$i")).toDF("id", "text")
      .coalesce(1).write.mode("append").parquet(dir)
    val m = DatasetManifest.append(spark, dir)
    assert(m.where($"pagesig".isNull).count() == 1 &&
      m.where($"pagesig".isNotNull).count() == 1)
    // a HEALTHY release must read all-ok under sampled (null === x is
    // null, which used to fall through to 'changed' and fail the gate) —
    // and the uncovered entry is enumerable for the advised full re-seal
    val v = DatasetManifest.verify(spark, dir, mode = "sampled")
    assert(v.where($"status" =!= "ok").count() == 0, v.collect().mkString("\n"))
    assert(v.where($"pagesig_manifest".isNull).count() == 1)
    // content checks still BIND where coverage exists: tamper the covered
    // (new-generation) file and sampled flags it
    val covered = m.where($"pagesig".isNotNull).select($"file").as[String].head()
    val p = Paths.get(dir, covered)
    val b = Files.readAllBytes(p)
    b(b.length / 2) = (b(b.length / 2) ^ 0xFF).toByte
    Files.write(p, b)
    Files.deleteIfExists(Paths.get(dir, "." + covered + ".crc"))
    val v2 = DatasetManifest.verify(spark, dir, mode = "sampled").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v2(covered) == "changed", v2.toString)
  }
}
