package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-16 delete arc: tombstone deletion across the ANN layouts
  * (plain IVF and composed IVF-PQ) and the admission indexes (fp/sig) —
  * the lifecycle verb the grow-only index stack lacked (at 100 TB a full
  * rebuild per takedown batch is not a plan).
  */
class AnnDeleteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables.embeddings(spark, sf0001)
  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("IVF: deleted ids never surface; exhaustive query ≡ brute force over survivors; " +
      "compact drops rows physically and clears tombstones; re-add guarded") {
    val dir = s"${tmp("ann_del_ivf")}/idx"
    Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 4, dir)
    val delIds = emb.where($"vec_id" % 7 === 0).select($"vec_id")
    val nDel = delIds.count()
    assert(nDel > 0 && Similarity.ivfDelete(spark, dir, delIds, "vec_id") == nDel)
    val delSet = delIds.as[Long].collect().toSet

    val queries = emb.orderBy($"vec_id").limit(4)
    val out = Similarity.ivfQuery(spark, dir, queries,
      "vec_id", "embedding", k = 5, nProbe = 2)
    assert(out.count() > 0)
    assert(out.where($"neighbor_id".isInCollection(delSet)).count() == 0,
      "a deleted id surfaced from ivfQuery")

    // at nProbe = nCells, deletion ≡ the index never held the ids: the
    // tombstoned query is ROW-IDENTICAL to brute force over the survivors
    val exhaustive = Similarity.ivfQuery(spark, dir, queries,
      "vec_id", "embedding", k = 5, nProbe = 4)
    val survivors = emb.join(delIds, Seq("vec_id"), "left_anti")
    val bf = Similarity.bruteForceTopK(survivors, queries,
      "vec_id", "embedding", k = 5)
    assert(exhaustive.exceptAll(bf).isEmpty && bf.exceptAll(exhaustive).isEmpty,
      "tombstoned exhaustive query differs from brute force over survivors")

    // recall runs over the LIVE index only
    val r = Similarity.indexRecall(spark, dir, k = 3, nProbe = 4, nQueries = 4)
    assert(r >= 0.0 && r <= 1.0)

    // re-using a tombstoned id before the deletion is resolved is LOUD
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfAppend(spark, dir,
        emb.where($"vec_id".isInCollection(delSet)).limit(1),
        "vec_id", "embedding")
    }
    assert(err.getMessage.contains("tombstoned"), err.getMessage)

    // compact = the physical resolution: live rows only, tombstones gone
    // (reads BEFORE the compact bind to the pre-compact generation)
    val liveBefore = spark.read.parquet(s"${IncrementalDedup.readRoot(dir)}/cells")
      .select($"neighbor_id", $"cell").collect().toSet
    assert(Similarity.ivfCompact(spark, dir) == emb.count() - nDel)
    assert(!IndexFs.exists(s"${IncrementalDedup.readRoot(dir)}/tombstones"),
      "compact must clear tombstones")
    val after = spark.read.parquet(s"${IncrementalDedup.readRoot(dir)}/cells")
    assert(after.count() == emb.count() - nDel)
    assert(after.where($"neighbor_id".isInCollection(delSet)).count() == 0)
    // surviving rows carried verbatim (same cells — compact moves bytes)
    assert(after.select($"neighbor_id", $"cell").collect().toSet
      == liveBefore.filter(r => !delSet.contains(r.getLong(0))))

    // post-compact the id is appendable again — and live
    Similarity.ivfAppend(spark, dir,
      emb.where($"vec_id" === delSet.head), "vec_id", "embedding")
    val back = Similarity.ivfQuery(spark, dir,
      emb.where($"vec_id" === delSet.head), "vec_id", "embedding",
      k = 5, nProbe = 4)
    assert(back.count() == 5)
  }

  test("IVF-PQ (residual): deletion holds through the ADC pool, the adaptive filtered " +
      "path, and a rebuild resolves it physically") {
    val dir = s"${tmp("ann_del_pq")}/idx"
    ProductQuantizer.ivfPqBuildResidual(emb, "vec_id", "embedding",
      nCells = 4, m = 8, nCodes = 8, dir)
    val delIds = emb.where($"vec_id" % 5 === 1).select($"vec_id")
    val nDel = delIds.count()
    Similarity.ivfDelete(spark, dir, delIds, "vec_id")
    val delSet = delIds.as[Long].collect().toSet

    val queries = emb.orderBy($"vec_id".desc).limit(4)
    val out = ProductQuantizer.ivfPqQuery(spark, dir, queries,
      "vec_id", "embedding", k = 5, nProbe = 4, rerank = 50)
    assert(out.count() > 0)
    assert(out.where($"neighbor_id".isInCollection(delSet)).count() == 0,
      "a deleted id surfaced from the composed query")

    val filtered = ProductQuantizer.ivfPqQueryFilteredAdaptive(spark, dir,
      queries, "vec_id", "embedding",
      allowed = emb.select($"vec_id"), "vec_id", k = 5,
      baseNProbe = 4, rerank = 50)
    assert(filtered.where($"neighbor_id".isInCollection(delSet)).count() == 0)

    // recall harness never sees deleted ids (as query or ground truth)
    assert(Similarity.indexRecall(spark, dir, 3, 4, 4) >= 0.0)

    // rebuild = physical resolution for the composed layout
    assert(ProductQuantizer.ivfPqRebuild(spark, dir, nCells = 4)
      == emb.count() - nDel)
    assert(!IndexFs.exists(s"${IncrementalDedup.readRoot(dir)}/tombstones"))
    val cells = spark.read.parquet(s"${IncrementalDedup.readRoot(dir)}/cells")
    assert(cells.count() == emb.count() - nDel)
    assert(cells.where($"neighbor_id".isInCollection(delSet)).count() == 0)
  }

  test("fp index: a deleted fingerprint re-admits (the re-crawl contract), " +
      "compaction resolves it physically and equals a fresh index on survivors") {
    val ix = s"${tmp("ann_del_fp")}/fp"
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val fp = md5(col("text"))
    IncrementalDedup.buildIndex(docs, fp)
      .write.parquet(s"$ix/batch=1")

    // admission rejects all three (already admitted)
    def readIx() = IncrementalDedup.liveIndex(spark, ix,
      spark.read.parquet(IncrementalDedup.readRoot(ix)).select(col("fp")), "fp")
    assert(IncrementalDedup.admit(docs, readIx(), fp, col("doc_id")).count() == 0)

    // takedown of doc 2: its fingerprint is GONE for admission purposes
    IncrementalDedup.deleteFingerprints(spark, ix,
      docs.where($"doc_id" === 2).select(fp.as("fp")))
    val readmitted = IncrementalDedup.admit(docs, readIx(), fp, col("doc_id"))
    assert(readmitted.select($"doc_id").as[Long].collect().toSeq == Seq(2L),
      "the deleted fingerprint must re-admit exactly its page")

    // the re-crawl writes its delta and clears the tombstone — the THIRD
    // crawl of the same page is rejected again
    readmitted.select(col("fp")).write.parquet(s"$ix/batch=2")
    IncrementalDedup.readmitKeys(spark, ix, readmitted.select(col("fp")), "fp")
    assert(!IndexFs.exists(s"${IncrementalDedup.readRoot(ix)}/_tombstones"))
    assert(IncrementalDedup.admit(docs, readIx(), fp, col("doc_id")).count() == 0)

    // a still-pending tombstone resolves physically at compaction and the
    // compacted table equals a fresh index built on the survivors
    IncrementalDedup.deleteFingerprints(spark, ix,
      docs.where($"doc_id" === 3).select(fp.as("fp")))
    IncrementalDedup.compactFpIndex(spark, ix)
    assert(!IndexFs.exists(s"${IncrementalDedup.readRoot(ix)}/_tombstones"), "compaction must clear tombstones")
    val fresh = IncrementalDedup.buildIndex(docs.where($"doc_id" =!= 3), fp)
    val compacted = spark.read.parquet(IncrementalDedup.readRoot(ix)).select(col("fp"))
    assert(compacted.exceptAll(fresh).isEmpty && fresh.exceptAll(compacted).isEmpty,
      "compacted index must equal a fresh build on the surviving corpus")
  }

  test("fp index: fold-preserved deltas carry the tombstone table so deletion keeps applying") {
    val ix = s"${tmp("ann_del_fp2")}/fp"
    Seq("a", "b").toDF("fp").write.parquet(s"$ix/batch=1")
    Seq("c", "d").toDF("fp").write.parquet(s"$ix/batch=2")
    IncrementalDedup.deleteFingerprints(spark, ix, Seq("c").toDF("fp"))
    // batch=2 is preserved AS a delta — its tombstoned row never saw the
    // compaction anti-join, so the table must ride along
    IncrementalDedup.compactFpIndex(spark, ix, preserveBatchIds = Set(2L))
    assert(IndexFs.exists(s"${IncrementalDedup.readRoot(ix)}/_tombstones"),
      "tombstones must survive when preserved deltas bypass the compaction")
    val live = IncrementalDedup.liveIndex(spark, ix,
      spark.read.parquet(IncrementalDedup.readRoot(ix)).select(col("fp")), "fp")
    assert(live.as[String].collect().toSet == Set("a", "b", "d"))
    // a writer-quiesced compaction then resolves it fully
    IncrementalDedup.compactFpIndex(spark, ix)
    assert(!IndexFs.exists(s"${IncrementalDedup.readRoot(ix)}/_tombstones"))
    assert(spark.read.parquet(IncrementalDedup.readRoot(ix)).select(col("fp")).as[String].collect().toSet
      == Set("a", "b", "d"))
  }

  test("sig index: deleted ids are gone for near-dup admission; compaction drops their rows") {
    val ix = s"${tmp("ann_del_sig")}/sig"
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (20L, "an entirely different document about spark query planning"))
      .toDF("doc_id", "text")
    IncrementalDedup.buildSigIndex(docs, col("doc_id"), col("text"))
      .write.parquet(s"$ix/batch=1")
    def readIx() = IncrementalDedup.liveIndex(spark, ix,
      spark.read.parquet(IncrementalDedup.readRoot(ix)).select(col("id"), col("sig")), "id")
    // both docs are near-dups of themselves → rejected
    assert(IncrementalDedup.admitNearDup(docs, readIx(), "doc_id", "text")
      .count() == 0)
    IncrementalDedup.deleteSignatureIds(spark, ix,
      Seq(10L).toDF("id"))
    val admitted = IncrementalDedup.admitNearDup(docs, readIx(), "doc_id", "text")
    assert(admitted.select($"doc_id").as[Long].collect().toSeq == Seq(10L))
    assert(IncrementalDedup.compactSigIndex(spark, ix) == 1)
    assert(spark.read.parquet(IncrementalDedup.readRoot(ix)).select($"id").as[Long].collect().toSeq
      == Seq(20L))
    assert(!IndexFs.exists(s"${IncrementalDedup.readRoot(ix)}/_tombstones"))
  }

  test("admission-index tombstone pressure: maintainAdmissionIndex compacts " +
      "past the fraction, no-ops below it and after the resolve") {
    val ix = s"${tmp("adm_maint")}/fp"
    (1L to 100L).map(i => s"fp$i").toDF("fp").write.parquet(s"$ix/batch=1")
    // below threshold: 10/100 tombstoned -> no action, table stays
    IncrementalDedup.deleteFingerprints(spark, ix,
      (1L to 10L).map(i => s"fp$i").toDF("fp"))
    assert(!IncrementalDedup.maintainAdmissionIndex(spark, ix, "fp", 0.25))
    assert(IndexFs.exists(s"${IncrementalDedup.readRoot(ix)}/_tombstones"))
    // past it: 30/100 -> compact fires, rows physically dropped, cleared
    IncrementalDedup.deleteFingerprints(spark, ix,
      (11L to 30L).map(i => s"fp$i").toDF("fp"))
    assert(IncrementalDedup.maintainAdmissionIndex(spark, ix, "fp", 0.25))
    assert(!IndexFs.exists(s"${IncrementalDedup.readRoot(ix)}/_tombstones"))
    assert(spark.read.parquet(IncrementalDedup.readRoot(ix)).count() == 70)
    // pressure relieved: the next call is a no-op
    assert(!IncrementalDedup.maintainAdmissionIndex(spark, ix, "fp", 0.25))
    // sig twin drives the other compactor
    val sx = s"${tmp("adm_maint_sig")}/sig"
    IncrementalDedup.buildSigIndex(
      (1L to 10L).map(i => (i, s"document number $i about spark " +
        s"planning topic$i with enough words")).toDF("doc_id", "text"),
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"))
      .write.parquet(s"$sx/batch=1")
    IncrementalDedup.deleteSignatureIds(spark, sx, (1L to 4L).toDF("id"))
    assert(IncrementalDedup.maintainAdmissionIndex(spark, sx, "sig", 0.25))
    assert(!IndexFs.exists(s"${IncrementalDedup.readRoot(sx)}/_tombstones"))
    assert(spark.read.parquet(IncrementalDedup.readRoot(sx)).select($"id").as[Long].collect().toSet
      == (5L to 10L).toSet)
  }

  test("a takedown landing DURING readmitKeys' rewrite is carried verbatim, " +
      "not silently un-deleted") {
    // removeTombstones is a read-modify-write swap of the tombstone
    // table; before round 17 a takedown appended between its snapshot
    // read and its swap was discarded — the takedown reported success
    // but the key stayed live (the exact resurface failure ivfDelete's
    // guard exists to prevent). The rewrite now snapshots the FILE SET
    // and carries late files into the new table.
    val base = tmp("ts_race")
    val ix = s"$base/fp"
    Seq("x").toDF("fp").write.parquet(s"$ix/batch=1")
    IncrementalDedup.deleteFingerprints(spark, ix, Seq("a", "b").toDF("fp"))
    val tsDir = s"$ix/_tombstones"
    // the racing takedown's delete batch, pre-written so the mid-rewrite
    // injection is a pure file rename (what a concurrent appendTombstones
    // commit looks like at the filesystem)
    val donor = s"$base/donor"
    Seq("c").toDF("fp").coalesce(1).write.parquet(donor)
    TombstoneRaceInject.src = spark.read.parquet(donor).inputFiles.head
    TombstoneRaceInject.dst = s"$tsDir/part-late-takedown.parquet"
    // a keys frame whose EVALUATION fires the injection: evaluated inside
    // removeTombstones strictly after its file snapshot (driver code that
    // ran before any action on `keys`) and strictly before its swap
    val keys = Seq("a").toDS().coalesce(1).mapPartitions { it =>
      TombstoneRaceInject.fire(); it
    }.toDF("fp")
    IncrementalDedup.readmitKeys(spark, ix, keys, "fp")
    val after = spark.read.parquet(tsDir).select($"fp").as[String]
      .collect().toSet
    assert(after == Set("b", "c"),
      s"expected the late takedown (c) carried and only (a) readmitted, got $after")
    // and the late takedown actually APPLIES
    val live = IncrementalDedup.liveIndex(spark, ix,
      Seq("a", "b", "c", "x").toDF("fp"), "fp")
    assert(live.as[String].collect().toSet == Set("a", "x"))
  }
  test("upsert guards: duplicate ids in one batch fail loudly; append of an upserted id redirects to ivfUpsert") {
    val dir = tmp("ann_upsert_guard") + "/idx"
    Similarity.ivfBuild(emb, "vec_id", "embedding", 4, dir)
    val one = emb.where($"vec_id" === 3L).select($"vec_id", $"embedding")
    val dup = one.unionAll(one)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfUpsert(spark, dir, dup, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("duplicate id"), e.getMessage)
    Similarity.ivfUpsert(spark, dir, one, "vec_id", "embedding")
    // appending a base row for an id with stored versions would be
    // silently hidden by the overlay — must fail loudly naming the verb
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfAppend(spark, dir,
        one.select(($"vec_id").as("vec_id"), $"embedding"),
        "vec_id", "embedding")
    }
    assert(e2.getMessage.contains("ivfUpsert"), e2.getMessage)
    // upsert never leaks the lease
    assert(!IndexFs.exists(IndexLease.leasePath(dir)))
  }

  test("ivfUpsert replay: a pinned useq overwrites its own rows (no duplicate versions); misuse of the pin fails loudly") {
    val dir = tmp("ann_upsert_replay") + "/idx"
    Similarity.ivfBuild(emb, "vec_id", "embedding", 4, dir)
    val root = IncrementalDedup.readRoot(dir)
    def deltaRows() = spark.read.parquet(s"$root/upserts").count()
    val batchA = emb.where($"vec_id" % 11 === 0)
      .select($"vec_id", transform($"embedding",
        x => (x + lit(0.25f)).cast("float")).as("embedding"))
    val batchB = emb.where($"vec_id" % 13 === 0)
      .select($"vec_id", transform($"embedding",
        x => (x - lit(0.25f)).cast("float")).as("embedding"))
    Similarity.ivfUpsert(spark, dir, batchA, "vec_id", "embedding") // useq 0
    Similarity.ivfUpsert(spark, dir, batchB, "vec_id", "embedding") // useq 1
    val before = deltaRows()
    val answersBefore = Similarity.ivfQuery(spark, dir,
      emb.orderBy($"vec_id").limit(3), "vec_id", "embedding",
      k = 5, nProbe = 4).collect().toSeq
    // the crash-retry: replaying batch B under its own pinned sequence
    // lands ZERO net rows — the commit overwrote itself
    Similarity.ivfUpsert(spark, dir, batchB, "vec_id", "embedding",
      useq = Some(1L))
    assert(deltaRows() == before,
      s"replay inflated the delta: $before -> ${deltaRows()}")
    assert(Similarity.ivfQuery(spark, dir, emb.orderBy($"vec_id").limit(3),
        "vec_id", "embedding", k = 5, nProbe = 4).collect().toSeq
      == answersBefore, "replay changed answers")
    // and the exhaustive view is still exactly the current corpus
    val corpus = emb.select($"vec_id", $"embedding")
      .join(batchA.unionByName(batchB).select($"vec_id"),
        Seq("vec_id"), "left_anti")
      .unionByName(batchA).unionByName(batchB)
    val queries = emb.orderBy($"vec_id").limit(3)
    val got = Similarity.ivfQuery(spark, dir, queries, "vec_id",
      "embedding", k = 5, nProbe = 4)
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id",
      "embedding", k = 5)
    assert(got.exceptAll(bf).unionAll(bf.exceptAll(got)).count() == 0,
      "post-replay exhaustive view diverged from brute force")
    // pin misuse 1: an existing sequence whose ids this batch does not
    // cover — overwriting would destroy those versions
    val e1 = intercept[IllegalArgumentException] {
      Similarity.ivfUpsert(spark, dir, batchA, "vec_id", "embedding",
        useq = Some(1L))
    }
    assert(e1.getMessage.contains("destroy"), e1.getMessage)
    // pin misuse 2: below the stored maximum — newer versions would
    // outrank the "new" one
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfUpsert(spark, dir, batchB, "vec_id", "embedding",
        useq = Some(0L))
    }
    assert(e2.getMessage.contains("below the stored maximum"), e2.getMessage)
    assert(deltaRows() == before, "a refused pin landed rows")
    // the deletion-marker path shares the per-commit layout: a takedown
    // of an upserted id still outranks every stored version
    val victim = batchB.select($"vec_id").orderBy($"vec_id").limit(1)
    Similarity.ivfDelete(spark, dir, victim, "vec_id")
    val vid = victim.as[Long].head()
    assert(Similarity.ivfQuery(spark, dir, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .where($"neighbor_id" === vid).count() == 0,
      "a deleted upserted id surfaced after the layout change")
  }
}

/** Driver/executor-shared injection point for the tombstone-race drill
  * (object statics are per-JVM — exactly right under local mode, where
  * tasks share the test JVM). `fire` is idempotent: a retried task must
  * not fail on the second rename.
  */
object TombstoneRaceInject {
  @volatile var src: String = _
  @volatile var dst: String = _
  def fire(): Unit =
    if (src != null && IndexFs.exists(src)) IndexFs.rename(src, dst)

}
