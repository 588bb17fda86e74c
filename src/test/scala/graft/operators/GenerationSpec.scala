package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reader-vs-swap safety ([[IncrementalDedup.commitGeneration]] +
  * [[IncrementalDedup.readRoot]]): maintenance swaps commit IMMUTABLE
  * generation dirs and retire a generation only when the SECOND one after
  * it commits — so a query that resolved its root before a concurrent
  * compact/rebuild completes against its pinned generation with PRE-swap
  * answers, instead of dying on renamed-away files (the rename-aside swap
  * moved the files a mid-scan query had already planned against — the one
  * place the writer-side lease discipline was not applied to readers).
  */
class GenerationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.core.Tables.documents(spark, sf0001)
  private def emb = graft.core.Tables.embeddings(spark, sf0001)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/ix"

  test("a reader pinned before a compact completes with PRE-swap answers; new readers resolve the new generation") {
    val dir = tmp("gen_pin_lex")
    LexIndex.build(docs, "doc_id", "text", dir, nBuckets = 8)
    val nAll = docs.count()
    // pin: resolve the root and build a LAZY plan over it — nothing below
    // executes until after the swap (this is exactly what a long scan
    // racing a maintenance fold looks like: paths planned pre-swap,
    // bytes read post-swap)
    val root0 = IncrementalDedup.readRoot(dir)
    val pinnedDoclens = spark.read.parquet(s"$root0/doclens")
    val pinnedQuery = LexIndex.bm25TopKFromIndex(spark, dir,
      Seq("spark", "merge"), k = 15)
    val preAnswers = TextSearch.bm25TopK(docs, $"doc_id", $"text",
      Seq("spark", "merge"), k = 15).collect().toSeq

    // the concurrent maintenance: a takedown + physical compact commits
    // generation 1 while the pinned reader has not executed yet
    val delPred = $"doc_id" % 4 === 0
    LexIndex.delete(spark, dir, docs.where(delPred).select($"doc_id"),
      "doc_id")
    LexIndex.compact(spark, dir)
    val root1 = IncrementalDedup.readRoot(dir)
    assert(root1 != root0, "compact must commit a new generation")

    // the pinned reader executes NOW — post-swap — and must see the
    // PRE-swap world: every document (including the later-deleted ones),
    // no FileNotFound, scores exactly the pre-delete scan's
    assert(pinnedDoclens.count() == nAll,
      "pinned reader lost rows to the swap")
    assert(pinnedQuery.orderBy($"score".desc, $"id").collect().toSeq
      == preAnswers, "pinned reader's answers drifted across the swap")

    // a FRESH resolve sees the post-compact world exactly
    assert(spark.read.parquet(s"$root1/doclens").count()
      == docs.where(!delPred).count())
    assert(!IndexFs.exists(s"$root1/tombstones"))
  }

  test("ANN: a query planned before delete+compact serves pre-swap candidates; a fresh query excludes them") {
    val dir = tmp("gen_pin_ivf")
    Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 4, dir)
    val q = emb.where($"vec_id" === 17L)
    // exhaustive probes so membership is deterministic
    val pinned = Similarity.ivfQuery(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 4)
    val pre = pinned.collect().toSeq
    val victim = pre.head.getAs[Long]("neighbor_id")
    Similarity.ivfDelete(spark, dir, Seq(victim).toDF("vec_id"), "vec_id")
    Similarity.ivfCompact(spark, dir)
    // pinned plan: built against generation 0 (no tombstones existed at
    // plan time) — re-executing it reads the retained old generation and
    // reproduces the pre-swap rows exactly
    assert(pinned.collect().toSeq == pre,
      "pinned ANN plan drifted across the swap")
    // fresh query: the new generation physically dropped the victim
    val fresh = Similarity.ivfQuery(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 4).collect().toSeq
    assert(!fresh.exists(_.getAs[Long]("neighbor_id") == victim),
      "deleted id surfaced in the fresh post-compact query")
  }

  test("retire path: generation j dies when j+2 commits — one full swap of grace, never less") {
    val dir = tmp("gen_retire")
    LexIndex.build(docs.where($"doc_id" < 300), "doc_id", "text", dir,
      nBuckets = 4)
    assert(IncrementalDedup.generations(dir).isEmpty, "fresh build is root-layout")
    // swap 1: generation 1 commits; the implicit root generation (0) is
    // IN grace — its tables must survive for readers pinned pre-swap
    LexIndex.compact(spark, dir)
    assert(IncrementalDedup.generations(dir) == Seq(1L))
    assert(IndexFs.exists(s"$dir/postings"),
      "the converting swap retired the root generation readers may hold")
    // swap 2: generation 2 commits; root (two swaps old) retires, 1 stays
    LexIndex.compact(spark, dir)
    assert(IncrementalDedup.generations(dir) == Seq(1L, 2L))
    assert(!IndexFs.exists(s"$dir/postings"),
      "out-of-grace root generation not retired")
    // swap 3: generation 3 commits; 1 retires, 2 stays
    LexIndex.compact(spark, dir)
    assert(IncrementalDedup.generations(dir) == Seq(2L, 3L))
    // queries stay exact through every commit
    val fromIndex = LexIndex.bm25TopKFromIndex(spark, dir,
      Seq("spark"), k = 10)
    val fromScan = TextSearch.bm25TopK(docs.where($"doc_id" < 300),
      $"doc_id", $"text", Seq("spark"), k = 10)
    assert(fromIndex.collect().toSeq == fromScan.collect().toSeq)
  }

  test("keep-k grace: a reader pinned at gen j survives TWO commits at keep=3 and is out of grace at keep=2") {
    // the round-19 contract was hard-coded one-swap grace; operators
    // running multi-hour queries under frequent maintenance raise `keep`
    // (MaintenancePolicy.keepGenerations / the verbs' keepGenerations).
    // keep=3 run: the pinned gen-1 reader must survive commits 2 AND 3.
    val d3 = tmp("gen_keep3")
    val sub = docs.where($"doc_id" < 300)
    LexIndex.build(sub, "doc_id", "text", d3, nBuckets = 4)
    LexIndex.compact(spark, d3, keepGenerations = 3) // gen 1
    val root1 = IncrementalDedup.readRoot(d3)
    val pinned = spark.read.parquet(s"$root1/doclens")
    val nPinned = sub.count()
    LexIndex.compact(spark, d3, keepGenerations = 3) // gen 2
    LexIndex.compact(spark, d3, keepGenerations = 3) // gen 3
    assert(IncrementalDedup.generations(d3) == Seq(1L, 2L, 3L),
      s"keep=3 must hold three generations, got " +
        s"${IncrementalDedup.generations(d3)}")
    assert(pinned.count() == nPinned,
      "gen-1 reader lost rows though keep=3 held its generation")
    // fourth commit: gen 1 is now out of grace even at keep=3
    LexIndex.compact(spark, d3, keepGenerations = 3) // gen 4
    assert(IncrementalDedup.generations(d3) == Seq(2L, 3L, 4L))
    assert(!IndexFs.exists(s"$d3/_gen_1"),
      "out-of-grace generation 1 not retired at keep=3")

    // keep=2 (the default) run: the same pinned reader is out of grace
    // after TWO commits — the documented boundary, pinned so a future
    // "keep more, always" change is a deliberate decision
    val d2 = tmp("gen_keep2")
    LexIndex.build(sub, "doc_id", "text", d2, nBuckets = 4)
    LexIndex.compact(spark, d2) // gen 1
    val r1 = IncrementalDedup.readRoot(d2)
    LexIndex.compact(spark, d2) // gen 2 — gen 1 still in grace
    assert(IndexFs.exists(r1), "keep=2 must retain gen 1 after one commit")
    LexIndex.compact(spark, d2) // gen 3 — gen 1 retires
    assert(!IndexFs.exists(r1),
      "keep=2 must retire gen 1 on the second commit after it")
    // ANN verbs thread the same knob
    val da = tmp("gen_keep_ann")
    Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 4, da)
    Similarity.ivfCompact(spark, da, keepGenerations = 3)
    Similarity.ivfCompact(spark, da, keepGenerations = 3)
    Similarity.ivfCompact(spark, da, keepGenerations = 3)
    assert(IncrementalDedup.generations(da) == Seq(1L, 2L, 3L))
    assert(Similarity.ivfQuery(spark, da, emb.where($"vec_id" === 1L),
      "vec_id", "embedding", k = 3, nProbe = 4).count() == 3)
  }

  test("in-place writers extend the generation they read: append + delete land in the live generation") {
    val dir = tmp("gen_writers")
    LexIndex.build(docs.where($"doc_id" % 2 === 0), "doc_id", "text", dir,
      nBuckets = 4)
    LexIndex.compact(spark, dir) // now generational
    LexIndex.append(spark, dir, docs.where($"doc_id" % 2 =!= 0),
      "doc_id", "text")
    val root = IncrementalDedup.readRoot(dir)
    assert(IndexFs.subdirNames(s"$root/postings").exists(_ != "batch=-1"),
      "append delta landed outside the live generation")
    // and the grown index still serves the exact union
    val fromIndex = LexIndex.bm25TopKFromIndex(spark, dir,
      Seq("spark", "merge"), k = 12)
    val fromScan = TextSearch.bm25TopK(docs, $"doc_id", $"text",
      Seq("spark", "merge"), k = 12)
    assert(fromIndex.collect().toSeq == fromScan.collect().toSeq)
  }

  test("readRoot is idempotent and a no-op for never-swapped dirs") {
    val dir = tmp("gen_idem")
    LexIndex.build(docs.where($"doc_id" < 100), "doc_id", "text", dir,
      nBuckets = 4)
    assert(IncrementalDedup.readRoot(dir) == dir)
    LexIndex.compact(spark, dir)
    val root = IncrementalDedup.readRoot(dir)
    assert(root == s"$dir/_gen_1")
    assert(IncrementalDedup.readRoot(root) == root,
      "resolving an already-resolved root must be the identity")
  }
}
