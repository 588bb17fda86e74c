package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Correctness of the sketch/approximate operators that have no SQL oracle:
  * MinHash-LSH and SimHash against exact recomputation, SRP-LSH recall
  * against brute force, multimodal stub determinism.
  */
class ExtensionOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001).cache()

  test("minhashNearDups finds planted near-duplicates and no false positives above threshold") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
      (3L, "completely different content about spark query engines and shuffles"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today")) // exact dup of 1
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashNearDups(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near dup caught
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc clean
  }

  test("minhash candidate jaccard equals exact shingle jaccard") {
    val sample = docs.filter($"doc_id" < 50)
    val viaLsh = DedupOps.minhashNearDups(sample, "doc_id", "text", threshold = 0.0)
    val exact = DedupOps.ngramJaccardPairs(
      sample.withColumn("g", lit(1)), "doc_id", "text", "g", n = 3, threshold = 0.0)
    val lshMap = viaLsh.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exactMap = exact.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every LSH candidate's reported jaccard must equal the exact value
    lshMap.foreach { case (k, v) => assert(math.abs(exactMap(k) - v) < 1e-12) }
  }

  test("prefix-filtered jaccard join returns exactly the inverted-index result") {
    // 0.3 exercises the low-threshold fallback route, 0.5/0.8 the real
    // prefix path (0.8 is the registry's t23 configuration)
    val sample = docs.filter($"doc_id" < 120).withColumn("g", lit(1))
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val plain = DedupOps.ngramJaccardPairs(sample, "doc_id", "text", "g", 3, t,
        maxDf = Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val prefix = DedupOps.prefixJaccardPairs(sample, "doc_id", "text", "g", 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(prefix == plain, s"threshold $t: prefix=$prefix plain=$plain")
    }
  }

  test("prefix join keeps pairs sitting EXACTLY on the threshold boundary") {
    // A and B have 9 shingles each sharing 8 → J = 8/10 = 0.8 exactly.
    // IEEE doubles round 0.8/1.8 ABOVE 4/9, so a strict position-filter
    // compare (or a strict length filter / prefix-length ceil) silently
    // drops exactly-qualifying pairs — the 1e-7 pruning slack is load-
    // bearing. This pinned the bug found by the factor-50 stress run
    // (282 284 vs 283 826 pairs).
    // Case 1: tiny boundary pair — 9 shingles each, 8 shared, J = 8/10.
    val words = (1 to 11).map(i => s"w$i")
    val a1 = words.mkString(" ")
    val b1 = (words.init :+ "different").mkString(" ")
    // Case 2: the FP-critical sizes — |A|=58, |B|=59, overlap 52:
    // J = 52/65 = 0.8 exactly, and α = 0.8/1.8·117 computes to
    // 52.00000000000001 in doubles while the first-common-token bound is
    // exactly 52 → a strict compare drops this qualifying pair.
    val common = (1 to 54).map(i => s"c$i").mkString(" ")
    val a2 = (1 to 6).map(i => s"a$i").mkString(" ") + " " + common
    val b2 = (1 to 7).map(i => s"b$i").mkString(" ") + " " + common
    val df = Seq((1L, a1), (2L, b1), (10L, a2), (11L, b2))
      .toDF("doc_id", "text").withColumn("g", col("doc_id") < 10) // separate groups
    val expect = Set((1L, 2L, 0.8), (10L, 11L, 0.8))
    val viaPrefix = DedupOps.prefixJaccardPairs(df, "doc_id", "text", "g", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaPrefix == expect, viaPrefix.mkString(","))
    val viaIndex = DedupOps.ngramJaccardPairs(df, "doc_id", "text", "g", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex == expect, viaIndex.mkString(","))
  }

  test("ngram jaccard df-cutoff drops only hot-shingle candidates, results unchanged") {
    val sample = docs.withColumn("g", lit(1)) // all 500 docs, one group
    val full = DedupOps.ngramJaccardPairs(sample, "doc_id", "text", "g", 3, 0.2,
      maxDf = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val cut = DedupOps.ngramJaccardPairs(sample, "doc_id", "text", "g", 3, 0.2,
      maxDf = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(full.nonEmpty) // planted near-dups exist in the fixture
    assert(cut == full)   // cutoff never changes emitted pairs or exact values
  }

  test("jaccardThresholdSensitivity equals per-threshold re-runs of the pair join") {
    val sample = docs.filter($"doc_id" < 120).withColumn("g", lit(1))
    val report = DedupOps.jaccardThresholdSensitivity(
      sample, "doc_id", "text", "g", n = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(report.keySet == (10 to 19).toSet, "full grid, including zero rows")
    for (t <- 10 to 19) {
      val pairs = DedupOps.ngramJaccardPairs(
        sample, "doc_id", "text", "g", n = 3, threshold = t / 20.0)
      val (docsRemoved, nPairs) = report(t)
      assert(nPairs == pairs.count(), s"t=$t pair count")
      assert(docsRemoved == pairs.select($"id_b").distinct().count(),
        s"t=$t docs with a smaller-id partner")
    }
  }

  test("jaccardThresholdSensitivity: exact boundary steps on a hand fixture") {
    // B = exact copy of A (J = 1, tmax = 20 -> removed at every step).
    // C/D: 19 shingles each over a DISJOINT word run, sharing the 16
    // pure-run shingles -> J = 16/22, tmax = (20*16) div 22 = 14 -> D
    // removed for t <= 14, gone at 15. E unrelated.
    val runC = (1 to 18).map(i => s"c$i").mkString(" ")
    val runD = (1 to 18).map(i => s"d$i").mkString(" ")
    val df = Seq(
      (1L, "a " + runC), (2L, "a " + runC),
      (3L, "x y z " + runD), (4L, "p q r " + runD),
      (5L, (1 to 30).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text").withColumn("g", lit(1))
    val got = DedupOps.jaccardThresholdSensitivity(df, "doc_id", "text", "g")
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    for (t <- 10 to 14) assert(got(t) == 2L, s"t=$t: both B and D removed")
    for (t <- 15 to 19) assert(got(t) == 1L, s"t=$t: only the exact copy")
  }

  test("connectedComponents collapses multi-hop chains; cluster dedup keeps min id") {
    // chain 1-2-3-4 has diameter 3 → exercises multiple propagation rounds
    val ids = (1L to 8L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("id_a", "id_b")
    val comp = DedupClusters.connectedComponents(ids, pairs, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L))
    val kept = DedupClusters.dropDuplicateClusters(ids, pairs, "id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 6L, 8L))
  }

  test("annRecall emits one deterministic row per ANN method, recalls in (0,1]") {
    val emb = Tables.embeddings(spark, sf0001)
    def run() = Similarity.annRecall(emb, emb.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 5, bits = 4, nCells = 8, nProbe = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val r1 = run()
    assert(r1.map(_._1) == Seq("ivf", "lsh", "lsh_mp"))
    r1.foreach { case (m, rec) => assert(rec > 0.0 && rec <= 1.0, s"$m recall $rec") }
    // multi-probe strictly contains the single-probe candidate set
    assert(r1.toMap.apply("lsh_mp") >= r1.toMap.apply("lsh"))
    assert(run() == r1) // byte-stable across runs
  }

  test("persisted IVF index returns exactly the in-memory ivfTopK result") {
    import graft.core.Tables
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8, dir)
    val fromIndex = Similarity.ivfQuery(spark, dir, queries, "vec_id", "embedding",
      k = 5, nProbe = 3).orderBy($"query_id", $"rank").collect().toSeq
    val inMemory = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 8, nProbe = 3).orderBy($"query_id", $"rank").collect().toSeq
    assert(fromIndex == inMemory)
    // the on-disk layout is one directory per cell (partition pruning unit)
    val cellDirs = new java.io.File(s"$dir/cells").list().count(_.startsWith("cell="))
    assert(cellDirs == 8)
  }

  test("ivfAppend: frozen-centroid appends are associative; the grown index finds appended vectors") {
    import graft.core.Tables
    val emb = Tables.embeddings(spark, sf0001)
    val half = emb.where($"vec_id" % 2 === 0)
    val rest = emb.where($"vec_id" % 2 =!= 0)
    val dir1 = java.nio.file.Files.createTempDirectory("ivf_app1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("ivf_app2").toString
    Similarity.ivfBuild(half, "vec_id", "embedding", nCells = 8, dir1)
    Similarity.ivfBuild(half, "vec_id", "embedding", nCells = 8, dir2)
    // one-shot append vs the same rows in two batches: the frozen
    // quantizer makes assignment per-vector, so the grown indexes must
    // answer identically (associativity — the property that lets a
    // daemon append per snapshot without coordination)
    Similarity.ivfAppend(spark, dir1, rest, "vec_id", "embedding")
    Similarity.ivfAppend(spark, dir2, rest.where($"vec_id" % 4 === 1), "vec_id", "embedding")
    Similarity.ivfAppend(spark, dir2, rest.where($"vec_id" % 4 === 3), "vec_id", "embedding")
    val q = emb.filter($"vec_id" < 3)
    def res(dir: String) = Similarity.ivfQuery(spark, dir, q, "vec_id",
      "embedding", k = 5, nProbe = 5).orderBy($"query_id", $"rank").collect().toSeq
    assert(res(dir1) == res(dir2))
    // an appended exact copy of query 1's vector must surface as its top
    // neighbor (cosine 1.0 dominates; nProbe = nCells so no cell is unprobed)
    val copy = emb.where($"vec_id" === 1)
      .select(lit(9001L).as("vec_id"), $"embedding")
    Similarity.ivfAppend(spark, dir1, copy, "vec_id", "embedding")
    val top = Similarity.ivfQuery(spark, dir1, emb.where($"vec_id" === 1),
      "vec_id", "embedding", k = 1, nProbe = 8).collect()
    assert(top.length == 1 && top(0).getLong(2) == 9001L, top.mkString(","))
  }

  test("ivfAppend drift diagnostic: same-distribution ~1, shifted batch crosses the rebuild threshold, compact keeps the baseline, crashed swap heals") {
    import graft.core.Tables
    val emb = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("ivf_drift").toString
    Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8, dir)
    assert(new java.io.File(s"$dir/stats").exists(), "build must persist the baseline")
    // a batch drawn from the build distribution reads near ratio 1
    val same = Similarity.ivfAppend(spark, dir,
      emb.select(($"vec_id" + 10000L).as("vec_id"), $"embedding"),
      "vec_id", "embedding")
    assert(same.n == emb.count() && same.baselineMeanL2sq.isDefined)
    assert(same.driftRatio.exists(r => r > 0.5 && r < 1.5), same.toString)
    // a constant coordinate shift the quantizer never saw must flag
    val drifted = Similarity.ivfAppend(spark, dir,
      emb.select(($"vec_id" + 20000L).as("vec_id"),
        transform($"embedding", x => (x + lit(0.5f)).cast("float")).as("embedding")),
      "vec_id", "embedding")
    assert(drifted.driftRatio.exists(_ > 1.5), drifted.toString)
    // compaction carries the baseline along: the diagnostic survives
    Similarity.ivfCompact(spark, dir)
    assert(new java.io.File(s"$dir/stats").exists(), "compact must keep stats")
    val after = Similarity.ivfAppend(spark, dir,
      emb.select(($"vec_id" + 30000L).as("vec_id"), $"embedding"),
      "vec_id", "embedding")
    assert(after.driftRatio.exists(r => r > 0.5 && r < 1.5), after.toString)
    // crash window between replaceDir's two renames: no live dir, a
    // complete .old — every IVF entry point must self-heal, not fail
    val live = java.nio.file.Paths.get(dir)
    java.nio.file.Files.move(live, java.nio.file.Paths.get(s"$dir.old"))
    val q = emb.filter($"vec_id" < 3)
    val healed = Similarity.ivfQuery(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 3)
    assert(healed.count() > 0 && java.nio.file.Files.exists(live))
  }

  test("ivfRebuild re-trains the quantizer over the accumulated corpus and resets the drift baseline") {
    import graft.core.Tables
    val emb = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("ivf_rebuild").toString
    // build on half, then append a SHIFTED second half: under the frozen
    // quantizer the batch reads as heavy drift
    Similarity.ivfBuild(emb.where($"vec_id" % 2 === 0), "vec_id", "embedding", 8, dir)
    val shifted = emb.where($"vec_id" % 2 =!= 0)
      .select($"vec_id", transform($"embedding",
        x => (x + lit(0.5f)).cast("float")).as("embedding"))
    val before = Similarity.ivfAppend(spark, dir, shifted, "vec_id", "embedding")
    assert(before.driftRatio.exists(_ > 1.5), before.toString)
    // rebuild: quantizer re-trained on the union, swap atomic, count exact
    assert(Similarity.ivfRebuild(spark, dir, nCells = 8) == emb.count())
    assert(!new java.io.File(s"$dir.rebuild").exists())
    assert(!new java.io.File(s"$dir.old").exists())
    // the union's mass is preserved cell-partitioned and queryable
    assert(spark.read.parquet(s"$dir/cells").count() == emb.count())
    assert(Similarity.ivfQuery(spark, dir, emb.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 5, nProbe = 8).count() > 0)
    // re-baselined stats: a re-append of the same shifted distribution now
    // reads as in-distribution (the new quantizer has seen it)
    val after = Similarity.ivfAppend(spark, dir,
      shifted.select(($"vec_id" + 50000L).as("vec_id"), $"embedding"),
      "vec_id", "embedding")
    assert(after.driftRatio.exists(r => r > 0.3 && r < 1.5), after.toString)
  }

  test("indexRecall: exhaustive probes read exactly 1.0; production probes stay in (0, 1]; composed dispatch") {
    val emb = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("ivf_recall").toString
    Similarity.ivfBuild(emb, "vec_id", "embedding", 8, dir)
    // nProbe = nCells probes every cell: the candidate set is the full
    // corpus minus self under identical tiebreaks — brute force exactly
    assert(Similarity.indexRecall(spark, dir, k = 5, nProbe = 8, nQueries = 8) == 1.0)
    val r = Similarity.indexRecall(spark, dir, k = 5, nProbe = 2, nQueries = 8)
    assert(r > 0.0 && r <= 1.0, s"recall $r")
    // composed layout dispatches through ivfPqQuery (pq_model present)
    val pdir = java.nio.file.Files.createTempDirectory("ivfpq_recall").toString
    ProductQuantizer.ivfPqBuild(emb, "vec_id", "embedding", 8,
      ProductQuantizer.train(emb, "embedding", 16, 16), pdir)
    val rc = Similarity.indexRecall(spark, pdir, k = 5, nProbe = 5,
      nQueries = 8, rerank = 100)
    assert(rc > 0.0 && rc <= 1.0, s"composed recall $rc")
  }

  test("ivfQueryFiltered: exhaustive probes equal filtered brute force; soundness; empty filter") {
    import graft.core.Tables
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, sf)
      val allowed = emb.where($"vec_id" % 3 === 0)
      val queries = emb.filter($"vec_id" < 3)
      val dir = java.nio.file.Files.createTempDirectory("ivf_filter").toString
      Similarity.ivfBuild(emb, "vec_id", "embedding", 8, dir)
      // exhaustive theorem: probing every cell under the filter IS brute
      // force over the allowed set, row for row
      val exhaustive = Similarity.ivfQueryFiltered(spark, dir, queries,
        "vec_id", "embedding", allowed, "vec_id", k = 5, nProbe = 8)
      val bf = Similarity.bruteForceTopK(allowed, queries, "vec_id", "embedding", 5)
      assert(exhaustive.exceptAll(bf).isEmpty && bf.exceptAll(exhaustive).isEmpty)
      // soundness at the production config: no disallowed id can ever
      // surface (the semi-join is before scoring), and recall vs the
      // FILTERED brute force is the number the t125 floor locks
      val prod = Similarity.ivfQueryFiltered(spark, dir, queries,
        "vec_id", "embedding", allowed, "vec_id", k = 5, nProbe = 5)
        .localCheckpoint()
      assert(prod.join(allowed.select($"vec_id".as("neighbor_id")),
        Seq("neighbor_id"), "left_anti").count() == 0)
      val hits = prod.join(bf, Seq("query_id", "neighbor_id")).count()
      info(f"sf=$sf filtered recall@5 nProbe=5: ${hits.toDouble / bf.count()}%.3f")
      // an empty allowed set returns an empty result, not an error
      assert(Similarity.ivfQueryFiltered(spark, dir, queries, "vec_id",
        "embedding", allowed.where(lit(false)), "vec_id", 5, 5).count() == 0)
    }
  }

  test("ivfPqQueryFiltered: filtered ADC pool — exhaustive theorem, soundness, honest rerank budget") {
    import graft.core.Tables
    import graft.operators.{ProductQuantizer => PQ}
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, sf)
      val allowed = emb.where($"vec_id" % 3 === 0)
      val queries = emb.filter($"vec_id" < 3)
      val dir = java.nio.file.Files.createTempDirectory("ivfpq_filter").toString
      PQ.ivfPqBuild(emb, "vec_id", "embedding", 8,
        PQ.train(emb, "embedding", 16, 16), dir)
      // exhaustive theorem: every cell probed + a pool bigger than the
      // allowed corpus = brute force over the allowed set, row for row
      val n = allowed.count().toInt
      val exhaustive = PQ.ivfPqQueryFiltered(spark, dir, queries, "vec_id",
        "embedding", allowed, "vec_id", k = 5, nProbe = 8, rerank = n + 5)
      val bf = Similarity.bruteForceTopK(allowed, queries, "vec_id", "embedding", 5)
      assert(exhaustive.exceptAll(bf).isEmpty && bf.exceptAll(exhaustive).isEmpty)
      // production config: no disallowed id can surface (the semi-join
      // precedes ADC pooling — the rerank budget is spent on allowed
      // candidates only), and recall vs filtered brute force is printed
      // for the t126 floor record
      val prod = PQ.ivfPqQueryFiltered(spark, dir, queries, "vec_id",
        "embedding", allowed, "vec_id", k = 5, nProbe = 5, rerank = 100)
        .localCheckpoint()
      assert(prod.join(allowed.select($"vec_id".as("neighbor_id")),
        Seq("neighbor_id"), "left_anti").count() == 0)
      val hits = prod.join(bf, Seq("query_id", "neighbor_id")).count()
      info(f"sf=$sf composed filtered recall@5 nProbe=5 rerank=100: ${hits.toDouble / bf.count()}%.3f")
    }
  }

  test("adaptive filtered ANN: nProbeFor walks probes with selectivity; 1/10-selective queries hold the 0.6 floor") {
    // the correction rule itself: hold the expected allowed-candidate
    // volume, cap at the cell count (= the exhaustive theorem regime)
    assert(Similarity.nProbeFor(8, 5, 1.0) == 5)
    assert(Similarity.nProbeFor(8, 5, 1.0 / 3) == 8)
    assert(Similarity.nProbeFor(8, 5, 0.1) == 8)
    assert(Similarity.nProbeFor(64, 4, 0.25) == 16)
    assert(Similarity.nProbeFor(64, 4, 0.01) == 64)
    import graft.core.Tables
    import graft.operators.{ProductQuantizer => PQ}
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, sf)
      // 1/10-selective: the regime where the FIXED production nProbe loses
      // recall (the t125/t126 scaladoc contract) — adaptive must not
      val allowed = emb.where($"vec_id" % 10 === 0)
      val queries = emb.filter($"vec_id" < 3)
      val bf = Similarity.bruteForceTopK(allowed, queries, "vec_id",
        "embedding", 5).localCheckpoint()
      def recall(approx: org.apache.spark.sql.DataFrame): Double =
        approx.select($"query_id", $"neighbor_id")
          .join(bf.select($"query_id", $"neighbor_id"),
            Seq("query_id", "neighbor_id")).count().toDouble / bf.count()
      val ivfDir = java.nio.file.Files.createTempDirectory("ivf_adapt").toString
      Similarity.ivfBuild(emb, "vec_id", "embedding", 8, ivfDir)
      val rIvf = recall(Similarity.ivfQueryFilteredAdaptive(spark, ivfDir,
        queries, "vec_id", "embedding", allowed, "vec_id", 5, baseNProbe = 5))
      assert(rIvf >= 0.6, f"adaptive ivf recall $rIvf%.3f under 1/10 filter")
      // composed sibling over the residual layout
      val pqDir = java.nio.file.Files.createTempDirectory("ivfpq_adapt").toString
      PQ.ivfPqBuildResidual(emb, "vec_id", "embedding", 8, 16, 16, pqDir)
      val rPq = recall(PQ.ivfPqQueryFilteredAdaptive(spark, pqDir, queries,
        "vec_id", "embedding", allowed, "vec_id", 5, baseNProbe = 5,
        rerank = 100))
      assert(rPq >= 0.6, f"adaptive ivf-pq recall $rPq%.3f under 1/10 filter")
      info(f"sf=$sf adaptive 1/10-filter recall: ivf=$rIvf%.3f ivfpq=$rPq%.3f")
    }
  }

  test("ivfCompact coalesces appended cell files; queries stay row-identical") {
    import graft.core.Tables
    val emb = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("ivf_cmp").toString
    Similarity.ivfBuild(emb.where($"vec_id" % 2 === 0), "vec_id", "embedding", 8, dir)
    // three append batches -> at least one extra file per touched cell each
    for (r <- Seq(1, 3, 5))
      Similarity.ivfAppend(spark, dir,
        emb.where($"vec_id" % 6 === r), "vec_id", "embedding")
    def parquetFiles(): Long = {
      // resolve the live generation: the compact commits a new one
      val root = IncrementalDedup.readRoot(dir)
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$root/cells"))
      try w.filter(p => p.toString.endsWith(".parquet")).count()
      finally w.close()
    }
    val q = emb.filter($"vec_id" < 3)
    def res() = Similarity.ivfQuery(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 5).orderBy($"query_id", $"rank").collect().toSeq
    val before = res()
    val filesBefore = parquetFiles()
    assert(Similarity.ivfCompact(spark, dir) == emb.count())
    assert(parquetFiles() < filesBefore,
      s"compaction must reduce files (${parquetFiles()} vs $filesBefore)")
    assert(res() == before, "compaction moves bytes, never answers")
    assert(!new java.io.File(s"$dir.compact").exists())
    assert(!new java.io.File(s"$dir.old").exists())
  }

  test("simhash: identical texts collide, different texts differ") {
    val df = Seq(
      (1L, "spark is a distributed engine"),
      (2L, "spark is a distributed engine"),
      (3L, "duckdb is an embedded database")).toDF("id", "text")
    val sigs = df.select($"id", DedupOps.simhash($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("simhashNearDups catches single-token edits within hamming budget") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten")).toDF("id", "text")
    val pairs = DedupOps.simhashNearDups(df, "id", "text", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("embeddingNearDupsLsh: emitted pairs are exact-cosine-verified and recall " +
      "the planted near-dups without any blocking column") {
    // planted clusters: vectors 1/2 nearly identical, 3 its exact copy,
    // 4/5 an unrelated orthogonal-ish pair
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val base = Array.tabulate(64)(j => math.sin(j + 1))
    val corpus = Seq(
      (1L, vec(base.toSeq: _*)),
      (2L, vec(base.map(_ + 0.01).toSeq: _*)),             // near-dup of 1
      (3L, vec(base.toSeq: _*)),                            // exact dup of 1
      (4L, vec(Array.tabulate(64)(j => math.cos(3.0 * j)).toSeq: _*)),
      (5L, vec(Array.tabulate(64)(j => if (j % 2 == 0) 1.0 else -1.0).toSeq: _*))
    ).toDF("vec_id", "embedding")
    val got = Similarity.embeddingNearDupsLsh(corpus, "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = got.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)),
      s"planted dups missed: $pairs")
    assert(!pairs.exists(p => p._1 >= 4L || p._2 >= 4L), s"phantom pair: $pairs")
    // emitted sims are EXACT cosine (not an estimate): the 1-3 pair is 1.0
    assert(got.find(p => (p._1, p._2) == ((1L, 3L))).get._3 == 1.0)
  }

  test("embeddingNearDupsLsh emissions are a subset of the blocked-exact result " +
      "with identical sims (single-block oracle twin)") {
    val emb = Tables.embeddings(spark, sf0001)
    // the synthetic embeddings top out near cosine 0.5, so the gate runs at
    // the t18 threshold (0.3) with banding tuned for that regime: 3-bit
    // bands recall ~0.98 of pairs at s=0.3 (vs ~0.3 for the near-dup
    // defaults, which assume s >= 0.9)
    val lsh = Similarity.embeddingNearDupsLsh(emb, "vec_id", "embedding",
      threshold = 0.3, bandBits = 3, nBands = 16)
    // one global block = unconditionally complete all-pairs twin
    val exact = Similarity.embeddingNearDups(
      emb.withColumn("blk", lit(1)), "vec_id", "embedding", "blk", threshold = 0.3)
    assert(lsh.exceptAll(exact).isEmpty, "LSH emitted a pair the exact join does not contain")
    val nExact = exact.count()
    val nLsh = lsh.count()
    assert(nExact > 0, "gate vacuous: no exact pairs at threshold")
    assert(nLsh.toDouble / nExact >= 0.8, s"recall ${nLsh.toDouble / nExact} below floor")
  }

  test("multi-probe lshTopK dominates single-probe recall; multiProbe=0 is unchanged") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id")
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select($"query_id", $"neighbor_id").join(bf, Seq("query_id", "neighbor_id")).count()
    val single = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5, bits = 4)
    val zeroProbe = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 5, bits = 4, multiProbe = 0)
    assert(single.exceptAll(zeroProbe).isEmpty && zeroProbe.exceptAll(single).isEmpty)
    val multi = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 5, bits = 4, multiProbe = 4)
    // every single-probe candidate is still probed (bucket 0 distance), so
    // recall can only improve
    assert(hits(multi) >= hits(single))
    assert(hits(multi) > 0)
  }

  test("lshTopK neighbors are a subset of brute-force ranking with sane recall") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(approx.nonEmpty)
    // every LSH hit that brute-force also ranked top-20 is consistent; require
    // at least half of LSH results to appear in the exact top-20 (recall floor)
    val hits = approx.count(exact.contains)
    assert(hits.toDouble / approx.length >= 0.5)
  }

  test("ivfTopK recall against brute force") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(ivf.nonEmpty)
    val hits = ivf.count(exact.contains)
    assert(hits.toDouble / ivf.length >= 0.5, s"recall ${hits.toDouble / ivf.length}")
  }

  test("brute-force cosine matches a hand-computed value") {
    val df = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 1.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val res = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 0), "vec_id", "embedding", k = 2)
      .orderBy($"rank").collect()
    assert(res(0).getLong(2) == 1L) // cos(0,1)=1/sqrt(2) ~ 0.707
    assert(math.abs(res(0).getDouble(3) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(res(1).getLong(2) == 2L && math.abs(res(1).getDouble(3)) < 1e-12)
  }

  test("multimodal featurize is deterministic and matches payload bytes") {
    val feats = Multimodal.featurize(Multimodal.mediaFromDocuments(docs.filter($"doc_id" < 10)))
      .collect().sortBy(_.doc_id)
    val raw = docs.filter($"doc_id" < 10).select($"doc_id", $"text", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    feats.foreach { f =>
      val bytes = raw(f.doc_id).getBytes("UTF-8")
      assert(f.payload_len == bytes.length)
      assert(f.checksum == bytes.take(64).map(_ & 0xFF).sum.toLong)
      assert(Seq("image", "audio", "video").contains(f.modality))
    }
  }

  test("bmp round trip: hand-built fixture decodes to pinned dims and pixels via ImageIO") {
    // 5x3 exercises the 4-byte row padding (5*3=15 -> 16 bytes per row) and
    // non-multiple-of-8 hash cells
    def gray(x: Int, y: Int): Int = (x * 11 + y * 29 + 3) % 256
    val bmp = Multimodal.encodeBmp(5, 3, gray)
    assert(bmp.length == 54 + 16 * 3) // header + padded scanlines
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null && img.getWidth == 5 && img.getHeight == 3)
    // orientation: BMP stores rows bottom-up; getRGB must return gray(x, y)
    // in TOP-DOWN coordinates
    for (y <- 0 until 3; x <- 0 until 5) {
      val rgb = img.getRGB(x, y)
      assert((rgb & 0xFF) == gray(x, y), s"($x,$y)")
      assert(((rgb >> 8) & 0xFF) == gray(x, y) && ((rgb >> 16) & 0xFF) == gray(x, y))
    }
    // ImageIoDecoder: real dims for image payloads, stub path for opaque ones
    assert(Multimodal.ImageIoDecoder.decode("image", bmp) == ((5, 3)))
    val opaque = Array.tabulate[Byte](100)(_.toByte)
    assert(Multimodal.ImageIoDecoder.decode("image", opaque) ==
      Multimodal.StubDecoder.decode("image", opaque))
    assert(Multimodal.ImageIoDecoder.decode("audio", bmp) ==
      Multimodal.StubDecoder.decode("audio", bmp))
  }

  test("pixelFeatures: decoded-pixel stats match an independent reference computation") {
    def gray(id: Long)(x: Int, y: Int): Int = ((x * 5 + y * 17 + id * 3) % 256).toInt
    val dims = Map(1L -> (16, 8), 2L -> (5, 3), 3L -> (32, 24))
    val media = spark.createDataset(dims.toSeq.map { case (id, (w, h)) =>
      Multimodal.MediaRow(id, "image", Multimodal.encodeBmp(w, h, gray(id)))
    } :+ Multimodal.MediaRow(9L, "image", Array.tabulate[Byte](64)(_.toByte)))
    val got = Multimodal.pixelFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // undecodable payload dropped
    for ((id, (w, h)) <- dims) {
      val f = got(id)
      assert(f.width == w && f.height == h)
      val total = (for (y <- 0 until h; x <- 0 until w) yield gray(id)(x, y).toLong).sum
      assert(f.pix_sum == total, s"id=$id")
      val bits = (0 until 64).map { b =>
        val (r0, r1) = ((b / 8) * h / 8, (b / 8 + 1) * h / 8)
        val (c0, c1) = ((b % 8) * w / 8, (b % 8 + 1) * w / 8)
        val cell = for (y <- r0 until r1; x <- c0 until c1) yield gray(id)(x, y).toLong
        if (cell.sum * w * h > total * cell.size) '1' else '0'
      }.mkString
      assert(f.ahash_bits == bits, s"id=$id")
    }
  }

  test("wav round trip: hand-built fixture decodes to pinned stats via javax.sound") {
    val samples = Array[Short](0, 100, -100, 200, -200, 32767, -32768, 0)
    val wav = Multimodal.encodeWav(16000, samples)
    assert(wav.length == 44 + 16) // RIFF header + 8 16-bit samples
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "audio", wav),
      Multimodal.MediaRow(2L, "audio", Array.tabulate[Byte](64)(_.toByte))))
    val got = Multimodal.audioFeatures(media).collect()
    assert(got.map(_.doc_id).toSeq == Seq(1L)) // undecodable payload dropped
    val f = got(0)
    assert(f.sample_rate == 16000 && f.n_samples == 8)
    assert(f.energy_sq_sum == samples.map(s => s.toLong * s).sum)
    // sign sequence + + - + - + - + → six boundary transitions
    assert(f.zero_crossings == 6, f.toString)
  }

  test("avi round trip: hand-built uncompressed video decodes frame-exact") {
    def gray(f: Int)(x: Int, y: Int): Int = (x * 2 + y * 9 + f * 31 + 7) % 256
    val avi = Multimodal.encodeAvi(5, 3, 10, (0 until 2).map(f => gray(f) _))
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video", avi),
      Multimodal.MediaRow(2L, "video", Array.tabulate[Byte](64)(_.toByte)),
      // truncated mid-frame: must drop out, not mis-decode
      Multimodal.MediaRow(3L, "video", avi.dropRight(10))))
    val got = Multimodal.videoFrames(media).collect().sortBy(_.frame_idx)
    assert(got.map(_.doc_id).distinct.toSeq == Seq(1L))
    assert(got.length == 2)
    got.foreach { fr =>
      assert(fr.width == 5 && fr.height == 3 && fr.fps == 10)
      val expect = (for (y <- 0 until 3; x <- 0 until 5)
        yield gray(fr.frame_idx)(x, y).toLong).sum
      assert(fr.frame_sum == expect, fr.toString)
      // hash orientation: cells must be computed over TOP-DOWN image rows
      // (DIB scanlines are bottom-up; the sum can't catch a missed flip,
      // the hash can)
      val bits = (0 until 64).map { b =>
        val (r0, r1) = ((b / 8) * 3 / 8, (b / 8 + 1) * 3 / 8)
        val (c0, c1) = ((b % 8) * 5 / 8, (b % 8 + 1) * 5 / 8)
        val cell = for (y <- r0 until r1; x <- c0 until c1)
          yield gray(fr.frame_idx)(x, y).toLong
        if (cell.sum * 15 > expect * cell.size) '1' else '0'
      }.mkString
      assert(fr.ahash_bits == bits, fr.toString)
    }
  }

  test("frameNearDupPairs pairs duplicate frames within and across videos") {
    // video 1 and video 2 share frame content c=0 (v1 frame 0, v2 frame 1);
    // within v2, frames 1 and 2 are identical (static scene); video 3 is
    // unrelated high-frequency content
    def frame(c: Int)(x: Int, y: Int): Int = (x * 5 + y * 11 + c * 37) % 256
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video",
        Multimodal.encodeAvi(16, 8, 10, Seq(frame(0) _))),
      Multimodal.MediaRow(2L, "video",
        Multimodal.encodeAvi(16, 8, 10, Seq(frame(5) _, frame(0) _, frame(0) _))),
      Multimodal.MediaRow(3L, "video",
        Multimodal.encodeAvi(16, 8, 10, Seq((x, y) => ((x + y) % 2) * 255)))))
    // banded pairs must equal brute force over the per-frame hashes
    val feats = Multimodal.videoFrames(media).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f.ahash_bits).toMap
    def ham(a: String, b: String): Int = a.zip(b).count { case (p, q) => p != q }
    val keys = feats.keys.toSeq.sorted
    val brute = (for {
      a <- keys; b <- keys
      if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      h = ham(feats(a), feats(b)) if h <= 3
    } yield (a._1, a._2, b._1, b._2, h)).toSet
    val banded = Multimodal.frameNearDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .toSet
    assert(banded == brute, s"$banded vs $brute")
    // the constructed duplicates are pixel-exact pairs
    assert(banded.contains((1L, 0, 2L, 1, 0)), banded.toString) // across videos
    assert(banded.contains((2L, 1, 2L, 2, 0)), banded.toString) // within a video
  }

  test("pixelNearDupPairs catches cross-format duplicates byte-level hashing cannot") {
    def gray(x: Int, y: Int): Int = (x * 3 + y * 11 + 5) % 256
    val bmp = Multimodal.encodeBmp(32, 24, gray)
    // the SAME pixels re-encoded as PNG via the JDK encoder: entirely
    // different payload bytes, identical decoded image
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    assert(!java.util.Arrays.equals(png, bmp))
    val other = Multimodal.encodeBmp(32, 24, (x, y) => ((x / 4 + y / 4) % 2) * 255)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", bmp),
      Multimodal.MediaRow(2L, "image", png),
      Multimodal.MediaRow(3L, "image", other)))

    // banded pixel pairs must equal brute-force Hamming over the pixel
    // hashes (pigeonhole losslessness), and the BMP/PNG pair is exact
    val feats = Multimodal.pixelFeatures(media).collect()
      .map(f => f.doc_id -> f.ahash_bits).toMap
    def ham(a: String, b: String): Int = a.zip(b).count { case (p, q) => p != q }
    val ids = feats.keys.toSeq.sorted
    val brute = (for {
      i <- ids; jj <- ids if i < jj
      h = ham(feats(i), feats(jj)) if h <= 3
    } yield (i, jj, h)).toSet
    val banded = Multimodal.pixelNearDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute, s"$banded vs $brute")
    assert(banded.contains((1L, 2L, 0)), s"re-encode must be pixel-exact: $banded")

    // the byte-level path cannot see the re-encode (no shared bytes)
    val bytePairs = Multimodal
      .nearDupPairs(media.toDF(), "doc_id", "payload").collect()
      .map(r => Set(r.getLong(0), r.getLong(1))).toSet
    assert(!bytePairs.contains(Set(1L, 2L)), s"byte path saw $bytePairs")
  }

  test("multimodal resize and frameSample preserve keys and batch shape") {
    val media = Multimodal.mediaFromDocuments(docs.filter($"doc_id" < 30))
    val resized = Multimodal.resize(media, 64, 64).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.width == 64 && r.height == 64 && r.payload.nonEmpty)
    }
    // deterministic: same input -> same bytes
    val again = Multimodal.resize(media, 64, 64).collect()
    assert(resized.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => a.payload.sameElements(b.payload) })

    val frames = Multimodal.frameSample(media, frameBytes = 32, everyN = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0)) // every 2nd frame kept
    assert(frames.forall(f => f.payload.length <= 32))
  }

  test("multimodal nearDupPairs equals brute-force all-pairs (lossless banding)") {
    import graft.expressions.GraftFunctions
    // corpus: doc texts + near-variants (last byte changed) + one exact dup
    val base = docs.filter($"doc_id" < 40)
      .select(($"doc_id" * 3).as("media_id"), encode($"text", "UTF-8").as("payload"))
    val variant = docs.filter($"doc_id" < 40)
      .select(($"doc_id" * 3 + 1).as("media_id"),
        encode(concat(expr("substring(text, 1, length(text) - 1)"), lit("~")), "UTF-8")
          .as("payload"))
    val exact = docs.filter($"doc_id" < 5)
      .select(($"doc_id" * 3 + 2).as("media_id"), encode($"text", "UTF-8").as("payload"))
    val media = base.unionByName(variant).unionByName(exact)
    val banded = Multimodal.nearDupPairs(media, "media_id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the collected fingerprints
    val fps = media.select($"media_id", GraftFunctions.aHashBands($"payload").as("fp"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = fa.zip(fb).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (ia, ib, h)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty)
    // exact dups are found at distance 0
    assert((0L until 5L).forall(d => brute.contains((d * 3, d * 3 + 2, 0))))
    // thresholds >= 4 would break the pigeonhole proof and must be refused
    intercept[IllegalArgumentException] {
      Multimodal.nearDupPairs(media, "media_id", "payload", maxHamming = 4)
    }
  }

  test("langId flags Swedish function words ahead of English") {
    val df = Seq(
      (1L, "barnen gick till skolan och lärde sig att läsa"),
      (2L, "the children went to school and learned to read"),
      (3L, "xyzzy")).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.langId($"text")).as[(Long, String)]
      .collect().toMap
    assert(got(1L) == "sv" && got(2L) == "en" && got(3L) == "und")
  }

  test("dropDuplicateClustersBy keeps the arg-max of each cluster, id tiebreak") {
    // clusters {1,2,3} (chain), {4,5}, singleton {6}; scores pick 2, 5
    // over their peers; 7 ties 6's score but is its own cluster
    val nodes = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L), (4L, 7L), (5L, 7L), (6L, 1L))
      .toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = DedupClusters.dropDuplicateClustersBy(nodes, pairs, "id", $"score")
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // cluster {4,5}: equal scores -> smallest id (4) survives
    assert(got == Seq((2L, 30L), (4L, 7L), (6L, 1L)), got.toString)
  }

  test("scriptCounts: hand-computed per-script tallies and dominance") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      "abc 123",          // 3 latin, 3 digit -> latin
      "привет ab",        // 6 cyrillic, 2 latin -> cyrillic
      "你好 hi ok",       // 2 cjk, 4 latin -> latin
      "你好世界",          // 4 cjk only -> cjk
      "")                 // all zero -> latin (total tiebreak order)
      .toDF("t")
    val got = rows.select(
      TextAnalysis.scriptCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (3L, 0L, 0L, 3L, "latin"),
      (2L, 6L, 0L, 0L, "cyrillic"),
      (4L, 0L, 2L, 0L, "latin"),
      (0L, 0L, 4L, 0L, "cjk"),
      (0L, 0L, 0L, 0L, "latin")))
  }
}
