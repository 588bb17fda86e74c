package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val fp = md5(col("text"))

  test("admit drops batch rows whose fingerprint is already indexed") {
    val admitted = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    val batch = Seq((10L, "alpha"), (11L, "gamma")).toDF("id", "text")
    val idx = IncrementalDedup.buildIndex(admitted, fp)
    val got = IncrementalDedup.admit(batch, idx, fp, col("id"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(11L))
  }

  test("first-wins within the batch by the order column, caller columns survive") {
    val batch = Seq((7L, "x", "b"), (3L, "x", "a"), (5L, "y", "c"))
      .toDF("id", "text", "tag")
    val idx = IncrementalDedup.buildIndex(
      Seq.empty[(Long, String)].toDF("id", "text"), fp)
    val got = IncrementalDedup.admit(batch, idx, fp, col("id"))
      .select("id", "text", "tag").as[(Long, String, String)].collect().toSet
    assert(got == Set((3L, "x", "a"), (5L, "y", "c")))
  }

  test("updatedIndex closes the loop: re-admitting the same batch yields nothing") {
    val admitted = Seq((1L, "alpha")).toDF("id", "text")
    val batch = Seq((10L, "beta"), (11L, "beta"), (12L, "gamma")).toDF("id", "text")
    val idx0 = IncrementalDedup.buildIndex(admitted, fp)
    val first = IncrementalDedup.admit(batch, idx0, fp, col("id"))
    assert(first.select("id").as[Long].collect().toSet == Set(10L, 12L))
    val idx1 = IncrementalDedup.updatedIndex(idx0, first)
    assert(IncrementalDedup.admit(batch, idx1, fp, col("id")).count() == 0)
    // the index carries one row per distinct fingerprint, nothing else
    assert(idx1.columns.toSeq == Seq("fp") && idx1.count() == 3)
  }

  test("admitNearDup: exact and near copies of indexed docs are rejected, novel docs pass") {
    val base = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    val near = base.replace("today", "again") // 1 of ~12 shingles differs
    val novel = "completely different subject matter entirely about ships and the open sea voyage"
    val idx = IncrementalDedup.buildSigIndex(
      Seq((1L, base)).toDF("doc_id", "text"), col("doc_id"), col("text"))
    val batch = Seq((10L, base), (11L, near), (12L, novel)).toDF("doc_id", "text")
    val got = IncrementalDedup.admitNearDup(batch, idx, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(12L))
  }

  test("admitNearDup: within-batch clusters collapse to the min id; sig rides the output") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val idx = IncrementalDedup.buildSigIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), col("doc_id"), col("text"))
    val batch = Seq((7L, a), (3L, a), (9L, a + " omicron extra tail"),
      (5L, "unrelated words entirely and some more of them here to make shingles"))
      .toDF("doc_id", "text")
    val out = IncrementalDedup.admitNearDup(batch, idx, "doc_id", "text")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(3L) && !ids.contains(7L), s"min id must win its cluster: $ids")
    assert(ids.contains(5L))
    assert(out.columns.contains("sig") && out.columns.contains("id"))
    // folding admitted into the index blocks the whole batch next time
    val idx2 = IncrementalDedup.updatedSigIndex(idx, out)
    assert(IncrementalDedup.admitNearDup(batch, idx2, "doc_id", "text").count() == 0)
  }

  test("compactSigIndex folds append deltas into one table; admission is unaffected") {
    val dir = java.nio.file.Files.createTempDirectory("sig_idx").toString + "/idx"
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = "totally different words about rivers and hills and the people near them"
    // two append-style deltas, the admitNearDupStream layout
    IncrementalDedup.buildSigIndex(Seq((1L, a)).toDF("doc_id", "text"),
      col("doc_id"), col("text")).write.parquet(s"$dir/batch=0")
    IncrementalDedup.buildSigIndex(Seq((2L, b)).toDF("doc_id", "text"),
      col("doc_id"), col("text")).write.parquet(s"$dir/batch=1")
    val before = IncrementalDedup.admitNearDup(
      Seq((10L, a), (11L, b + " extra")).toDF("doc_id", "text"),
      spark.read.parquet(dir).select(col("id"), col("sig")), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(IncrementalDedup.compactSigIndex(spark, dir) == 2L)
    // the compact committed a new GENERATION: the folded table lives
    // under the resolved root as batch=-1 (the layout stays uniformly
    // partition-style there — root-level data files would be silently
    // IGNORED by partition discovery once the stream appends its next
    // batch=<id> delta)
    val root = IncrementalDedup.readRoot(dir)
    assert(root != dir, "compaction must commit a generation")
    assert(!new java.io.File(s"$root/batch=0").exists())
    assert(new java.io.File(s"$root/batch=-1").isDirectory)
    val after = IncrementalDedup.admitNearDup(
      Seq((10L, a), (11L, b + " extra")).toDF("doc_id", "text"),
      spark.read.parquet(root), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(after == before, s"$after vs $before")
  }

  test("stream appends after compaction: the compacted corpus stays visible to admission") {
    val dir = java.nio.file.Files.createTempDirectory("sig_idx2").toString + "/idx"
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val c = "yet another corpus of words concerning mountains and long winter roads"
    IncrementalDedup.buildSigIndex(Seq((1L, a)).toDF("doc_id", "text"),
      col("doc_id"), col("text")).write.parquet(s"$dir/batch=0")
    IncrementalDedup.compactSigIndex(spark, dir)
    // the stream keeps appending deltas AFTER the compaction — into the
    // LIVE generation (readRoot), exactly like the daemon's delta writer;
    // the compacted batch=-1 table and the new delta must both be visible
    IncrementalDedup.buildSigIndex(Seq((2L, c)).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .write.parquet(s"${IncrementalDedup.readRoot(dir)}/batch=7")
    val idx = spark.read.parquet(IncrementalDedup.readRoot(dir))
    assert(idx.select("id").as[Long].collect().toSet == Set(1L, 2L))
    val admitted = IncrementalDedup.admitNearDup(
      Seq((10L, a), (11L, c)).toDF("doc_id", "text"), idx, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted.isEmpty,
      s"old (compacted) and new (delta) index entries must both reject: $admitted")
  }

  test("compactFpIndex collapses fingerprint deltas to distinct fps under batch=-1") {
    val dir = java.nio.file.Files.createTempDirectory("fp_idx").toString + "/idx"
    Seq("f1", "f2").toDF("fp").write.parquet(s"$dir/batch=0")
    Seq("f2", "f3").toDF("fp").write.parquet(s"$dir/batch=1")
    assert(IncrementalDedup.compactFpIndex(spark, dir) == 3L) // distinct fps
    val root = IncrementalDedup.readRoot(dir)
    assert(new java.io.File(s"$root/batch=-1").isDirectory)
    assert(!new java.io.File(s"$root/batch=0").exists())
    // a delta appended after compaction coexists with the compacted set
    Seq("f4").toDF("fp").write.parquet(s"$root/batch=5")
    assert(spark.read.parquet(root).select("fp").as[String].collect().toSet ==
      Set("f1", "f2", "f3", "f4"))
  }

  test("compaction of an all-empty delta index is a no-op, not a crash") {
    val dir = java.nio.file.Files.createTempDirectory("empty_idx").toString + "/idx"
    // a zero-row delta can end up footerless (AQE collapses empty writes);
    // simulate the worst case: the dir exists with an empty batch subdir
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/batch=0"))
    assert(IncrementalDedup.compactFpIndex(spark, dir) == 0L)
  }

  test("compactRobotsIndex keeps the latest policy per host; later deltas still win") {
    val dir = java.nio.file.Files.createTempDirectory("rb_idx").toString + "/idx"
    Seq(("a.example", "Disallow: /old/"), ("b.example", "Disallow: /b/"))
      .toDF("host", "text").write.parquet(s"$dir/batch=0")
    Seq(("a.example", "Disallow: /new/"))
      .toDF("host", "text").write.parquet(s"$dir/batch=3")
    assert(IncrementalDedup.compactRobotsIndex(spark, dir) == 2L) // one row per host
    val root = IncrementalDedup.readRoot(dir)
    val compacted = spark.read.parquet(root)
      .select("host", "text").as[(String, String)].collect().toMap
    assert(compacted("a.example") == "Disallow: /new/") // latest batch won
    assert(compacted("b.example") == "Disallow: /b/")
    // compacted rows live under batch=-1: a post-compaction delta (any real
    // id > -1) must still out-rank them at latest-batch-wins read time
    Seq(("a.example", "Disallow: /newest/"))
      .toDF("host", "text").write.parquet(s"$root/batch=9")
    val resolved = spark.read.parquet(root)
      .groupBy($"host").agg(max_by($"text", $"batch").as("text"))
      .as[(String, String)].collect().toMap
    assert(resolved("a.example") == "Disallow: /newest/")
  }

  test("admitNearDup collapses identical signatures before banding (mass-duplicate batch)") {
    val viral = "breaking news story copied verbatim across every mirror site tonight again"
    val other = "quiet essay about gardening and the patience it requires of its readers"
    val idx = IncrementalDedup.buildSigIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), col("doc_id"), col("text"))
    // 400 exact copies + 1 distinct doc: the survivor band self-join would
    // have emitted 160k candidate pairs before the collapse; with it the
    // viral doc is ONE representative row through banding and clustering
    val batch = ((1L to 400L).map(i => (i + 100L, viral)) :+ (7L, other)).toDF("doc_id", "text")
    val out = IncrementalDedup.admitNearDup(batch, idx, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(7L, 101L))
    // the physical plan carries the collapse: an Aggregate on sig BELOW the
    // band explode (not just the pair distinct above it)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("min(id"), s"expected sig-collapse aggregate in plan:\n$plan")
  }

  test("admitNearDup hot-band cap: identical signatures reject even when every bucket overflows") {
    val base = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    val near = base.replace("today", "again")
    val novel = "completely different subject matter entirely about ships and the open sea voyage"
    // index: the base doc plus nine near-variants with DISTINCT signatures —
    // their postings crowd the band buckets they share
    val idxDocs = (1L to 9L).map(i => (i, base.replace("today", s"day$i"))) :+ ((10L, base))
    val idx = IncrementalDedup.buildSigIndex(
      idxDocs.toDF("doc_id", "text"), col("doc_id"), col("text"))
    // cap = 1: every bucket shared by 2+ distinct index sigs is dropped from
    // banded candidate generation — yet the exact copy of an indexed doc is
    // STILL rejected (full-signature equi-join, immune to the cap), and the
    // novel doc still passes
    val capped = IncrementalDedup.admitNearDup(
      Seq((20L, base), (21L, novel)).toDF("doc_id", "text"), idx, "doc_id", "text",
      maxBandPostings = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(capped == Set(21L), s"capped admission: $capped")
    // default cap: r12 semantics unchanged (near copies rejected via banding)
    val dflt = IncrementalDedup.admitNearDup(
      Seq((20L, base), (21L, near), (22L, novel)).toDF("doc_id", "text"),
      idx, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(dflt == Set(22L), s"default admission: $dflt")
  }

  test("two sequential batches equal one-shot dedup of their union (same order)") {
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"), (5L, "b"), (6L, "d"))
      .toDF("id", "text")
    val b1 = docs.where(col("id") <= 3)
    val b2 = docs.where(col("id") > 3)
    val empty = IncrementalDedup.buildIndex(b1.limit(0), fp)
    val a1 = IncrementalDedup.admit(b1, empty, fp, col("id"))
    val a2 = IncrementalDedup.admit(b2, IncrementalDedup.updatedIndex(empty, a1),
      fp, col("id"))
    val incremental = a1.select("id").union(a2.select("id")).as[Long].collect().toSet
    val oneShot = FirstWinsDedup(docs, Seq(fp), col("id"))
      .select("id").as[Long].collect().toSet
    assert(incremental == oneShot)
  }
}
