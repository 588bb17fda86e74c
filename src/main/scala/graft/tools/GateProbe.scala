package graft.tools

import graft.core.{GraftSession, Tables}
import graft.operators.{DedupOps, Similarity}
import org.apache.spark.sql.functions._

/** Measurement record for the t07/t08/t12/t22 gate floors: recalls of the
  * banded/bucketed operators vs their exact twins at each driver SF.
  * Measured 2026-08-14 (this run picked the committed floors):
  *   t07 minhash recall 1.0 at sf0.001 (28/28), sf0.01 (25/25), sf0.1
  *     (256/256), zero phantoms -> floor 0.6;
  *   t08 4x16 vs 8x8 banding: le-3 sets identical, zero le-7 misses at all
  *     SFs (the pigeonhole theorems hold empirically too);
  *   ann recall (round-13 `ann` sweep, sf0.001/0.01/0.1): the TUNED gate
  *     configs are ivf nCells=8 nProbe=5 -> 0.80/0.87/0.87 (floor 0.8,
  *     production path), lsh_mp bits=2 mp=2 -> 0.93/0.53/0.73 (floor 0.5),
  *     lsh single-probe bits=2 -> 0.53/0.20/0.40 (floor 0.15, designated
  *     weak baseline). Cell count must not outrun the corpus: nCells=16
  *     nProbe=8 gave 0.47 at n=500 but 0.93 at n=2000;
  *   pq recall (round-14 sweep): raw ADC ranks are weak on this
  *     near-uniform embedding cloud at every config (0.07-0.40 — the
  *     corpus-side quantization error shuffles barely-separated heads),
  *     and the re-ranked production shape recovers them: the t117 gate
  *     config m=16 nCodes=16 rerank=100 -> 0.93/1.00/0.87 (floor 0.8);
  *     runner-up m=8 nCodes=32 -> 0.87/0.80/0.80. The rerank pool must
  *     scale with the corpus (~5% of n): rr25 at n=2000 read 0.33-0.47.
  *   RESIDUAL IVF-PQ (round-15 sweep, unit-space coarse quantizer): at
  *     the same (m=16, nCodes=16) budget the residual encoding lifts
  *     pool recall where the corpus is largest — sf0.1 rr25 0.333 ->
  *     0.733 (np=8) / 0.400 -> 0.667 (np=5) vs raw — and the production
  *     config np=5 rr100 reads 0.800/0.867/0.800 (t118 floor 0.8); the
  *     append lifecycle reads 0.600/0.800/1.000 (t119 floor raised
  *     0.5 -> 0.6). CAUTION: an earlier cut anchored residuals at
  *     unitize(raw centroid) — distortion ROSE above raw (spec-caught);
  *     residual anchors must be the unit-space k-means means.
  *   annfilter (round-15): fixed np=5 recall vs FILTERED brute force
  *     decays with selectivity (0.50-0.73 at 1/100-1/3), the nProbeFor
  *     adaptive correction reads 1.000 everywhere, plain and composed
  *     alike (t128 floor 0.6 at the 1/10 filter).
  */
object GateProbe {

  /** `runMain graft.tools.GateProbe ann` — parameter sweep for the ANN
    * production-path tuning (round-13 verdict #1): recall@5 of each
    * (method, config) against brute force at every driver SF, so the gate
    * params/floors are picked from measurement, not hope.
    */
  /** The round-16 OPQ decision sweep: residual pool recall with vs
    * without the PCA-permutation rotation at identical code budget,
    * through [[graft.operators.ProductQuantizer.opqProbe]]'s in-memory
    * replica of the composed query math — run before investing in a
    * persisted `opq` layout version. Measured 2026-08-15 (full table in
    * NOTES_r16): rotation ties-or-wins at every config — rr25 gains
    * +0.054/+0.013/+0.054 at np5 and +0.026/+0.053/+0.067 at np8 across
    * sf0.001/0.01/0.1, rr100 ties-or-ahead (0.853→0.853, 0.840→0.853,
    * 0.867→0.893) — so the rotation LANDED as the persisted
    * `encoding = "opq"` ([[graft.operators.ProductQuantizer.ivfPqBuildOpq]]).
    */
  private def opqSweep(spark: org.apache.spark.sql.SparkSession): Unit = {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf")
      for ((np, rr) <- Seq((5, 25), (8, 25), (5, 100))) {
        val (plain, rotated) = graft.operators.ProductQuantizer.opqProbe(
          emb, "vec_id", "embedding", nCells = 8, m = 16, nCodes = 16,
          k = 5, nProbe = np, rerank = rr)
        println(f"[$sf] opq nProbe=$np rerank=$rr " +
          f"pool_recall plain=$plain%.3f rotated=$rotated%.3f")
      }
    }
  }

  private def annSweep(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf").cache()
      val n = emb.count()
      val q = emb.filter($"vec_id" < 3)
      val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select($"query_id", $"neighbor_id").cache()
      val denom = bf.count().toDouble
      def recall(approx: org.apache.spark.sql.DataFrame): Double =
        approx.select($"query_id", $"neighbor_id")
          .join(bf, Seq("query_id", "neighbor_id")).count() / denom
      for ((nc, np) <- Seq((8, 4), (8, 5), (16, 8), (32, 8), (45, 12), (45, 16)))
        println(f"[$sf] n=$n ivf nCells=$nc nProbe=$np recall=${recall(
          Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5, nc, np))}%.3f")
      for ((bits, mp) <- Seq((2, 0), (2, 2), (3, 3), (4, 4)))
        println(f"[$sf] n=$n lsh bits=$bits mp=$mp recall=${recall(
          Similarity.lshTopK(emb, q, "vec_id", "embedding", 5, bits, mp))}%.3f")
      // t114: half-built + appended index, queried at the gate config
      val dir = java.nio.file.Files.createTempDirectory("probe_ivf_app").toString
      Similarity.ivfBuild(emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding", 8, dir)
      Similarity.ivfAppend(spark, dir, emb.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding")
      println(f"[$sf] n=$n ivf_append nCells=8 nProbe=5 recall=${recall(
        Similarity.ivfQuery(spark, dir, q, "vec_id", "embedding", 5, nProbe = 5))}%.3f")
      // PQ storage tier: recall@5 per (m, nCodes) — codebooks must not
      // outrun the corpus (the IVF cells lesson, per subspace this time).
      // Raw ADC ranks carry the corpus-side quantization error; the
      // re-ranked (FAISS refine) recall is the production number.
      for ((m, nc) <- Seq((4, 16), (4, 32), (8, 16), (8, 32), (16, 16))) {
        val model = graft.operators.ProductQuantizer.train(emb, "embedding", m, nc)
        val raw = recall(graft.operators.ProductQuantizer
          .pqTopK(emb, q, "vec_id", "embedding", 5, model))
        val rr = Seq(25, 50, 100).map(r => f"rr$r=${recall(
          graft.operators.ProductQuantizer.pqTopKReranked(
            emb, q, "vec_id", "embedding", 5, model, rerank = r))}%.3f")
        println(f"[$sf] n=$n pq m=$m nCodes=$nc adc=$raw%.3f ${rr.mkString(" ")}")
      }
      // IVF-PQ composed layout: cell pruning x thin ADC x exact refine
      val pqm = graft.operators.ProductQuantizer.train(emb, "embedding", 16, 16)
      val ipDir = java.nio.file.Files.createTempDirectory("probe_ivfpq").toString
      graft.operators.ProductQuantizer.ivfPqBuild(emb, "vec_id", "embedding", 8, pqm, ipDir)
      for ((np, rr) <- Seq((4, 50), (5, 100), (6, 100), (8, 100)))
        println(f"[$sf] n=$n ivfpq nCells=8 nProbe=$np rerank=$rr recall=${recall(
          graft.operators.ProductQuantizer.ivfPqQuery(spark, ipDir, q,
            "vec_id", "embedding", 5, np, rr))}%.3f")
      // RESIDUAL encoding vs raw at matched (m, nCodes): rerank = k makes
      // the refined set exactly the ADC top-k, so the rr5 rows isolate
      // raw-ADC rank quality (the thing residual encoding exists to buy);
      // larger pools show how much refine I/O each encoding still needs
      val resDir = java.nio.file.Files.createTempDirectory("probe_ivfpq_res").toString
      graft.operators.ProductQuantizer.ivfPqBuildResidual(
        emb, "vec_id", "embedding", 8, 16, 16, resDir)
      for ((np, rr) <- Seq((8, 5), (5, 5), (8, 25), (5, 25), (5, 100)))
        println(f"[$sf] n=$n ivfpq_residual nCells=8 nProbe=$np rerank=$rr recall=${recall(
          graft.operators.ProductQuantizer.ivfPqQuery(spark, resDir, q,
            "vec_id", "embedding", 5, np, rr))}%.3f")
      for ((np, rr) <- Seq((8, 5), (5, 5), (8, 25), (5, 25)))
        println(f"[$sf] n=$n ivfpq_raw nCells=8 nProbe=$np rerank=$rr recall=${recall(
          graft.operators.ProductQuantizer.ivfPqQuery(spark, ipDir, q,
            "vec_id", "embedding", 5, np, rr))}%.3f")
      // residual append lifecycle (t119 shape under the residual layout)
      val resDir2 = java.nio.file.Files.createTempDirectory("probe_ivfpq_res_app").toString
      graft.operators.ProductQuantizer.ivfPqBuildResidual(
        emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding", 8, 16, 16, resDir2)
      graft.operators.ProductQuantizer.ivfPqAppend(
        spark, resDir2, emb.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding")
      println(f"[$sf] n=$n ivfpq_residual_append nProbe=5 rerank=100 recall=${recall(
        graft.operators.ProductQuantizer.ivfPqQuery(spark, resDir2, q,
          "vec_id", "embedding", 5, 5, 100))}%.3f")
      // t119 shape: half-built + appended composed index at the gate config
      val ipDir2 = java.nio.file.Files.createTempDirectory("probe_ivfpq_app").toString
      val pqmHalf = graft.operators.ProductQuantizer.train(
        emb.filter($"vec_id" % 2 === 0), "embedding", 16, 16)
      graft.operators.ProductQuantizer.ivfPqBuild(
        emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding", 8, pqmHalf, ipDir2)
      graft.operators.ProductQuantizer.ivfPqAppend(
        spark, ipDir2, emb.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding")
      println(f"[$sf] n=$n ivfpq_append nProbe=5 rerank=100 recall=${recall(
        graft.operators.ProductQuantizer.ivfPqQuery(spark, ipDir2, q,
          "vec_id", "embedding", 5, 5, 100))}%.3f")
      emb.unpersist(); bf.unpersist()
    }
  }

  /** `runMain graft.tools.GateProbe annfilter` — recall of the filtered
    * ANN paths vs FILTERED brute force as the filter tightens (1/3, 1/10,
    * 1/100 selectivity), at the fixed production probe count and at the
    * [[Similarity.nProbeFor]] adaptive setting — the measurement behind
    * the t125/t126 scaladoc table and the adaptive-helper spec floor.
    */
  private def annFilterSweep(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf").cache()
      val n = emb.count()
      val q = emb.filter($"vec_id" < 3)
      val ivfDir = java.nio.file.Files.createTempDirectory("probe_f_ivf").toString
      Similarity.ivfBuild(emb, "vec_id", "embedding", 8, ivfDir)
      val pqDir = java.nio.file.Files.createTempDirectory("probe_f_pq").toString
      graft.operators.ProductQuantizer.ivfPqBuildResidual(
        emb, "vec_id", "embedding", 8, 16, 16, pqDir)
      for (mod <- Seq(3, 10, 100)) {
        val allowed = emb.where($"vec_id" % mod === 0)
        val bf = Similarity.bruteForceTopK(allowed, q, "vec_id", "embedding", 5)
          .select($"query_id", $"neighbor_id").cache()
        val denom = bf.count().toDouble
        def recall(approx: org.apache.spark.sql.DataFrame): Double =
          approx.select($"query_id", $"neighbor_id")
            .join(bf, Seq("query_id", "neighbor_id")).count() / denom
        val fixedIvf = recall(Similarity.ivfQueryFiltered(spark, ivfDir, q,
          "vec_id", "embedding", allowed, "vec_id", 5, nProbe = 5))
        val adapIvf = recall(Similarity.ivfQueryFilteredAdaptive(spark,
          ivfDir, q, "vec_id", "embedding", allowed, "vec_id", 5,
          baseNProbe = 5))
        val fixedPq = recall(graft.operators.ProductQuantizer
          .ivfPqQueryFiltered(spark, pqDir, q, "vec_id", "embedding",
            allowed, "vec_id", 5, nProbe = 5, rerank = 100))
        val adapPq = recall(graft.operators.ProductQuantizer
          .ivfPqQueryFilteredAdaptive(spark, pqDir, q, "vec_id", "embedding",
            allowed, "vec_id", 5, baseNProbe = 5, rerank = 100))
        println(f"[$sf] n=$n sel=1/$mod ivf fixed(np=5)=$fixedIvf%.3f " +
          f"adaptive=$adapIvf%.3f | ivfpq_res fixed(np=5)=$fixedPq%.3f " +
          f"adaptive=$adapPq%.3f")
        bf.unpersist()
      }
      emb.unpersist()
    }
  }

  /** `runMain graft.tools.GateProbe refine` — the round-17 refine-width
    * decision sweep (VERDICT #6): the rerank stage reads the stored FULL
    * float vectors; an fp16/int8 refine copy would halve/quarter that
    * read, IF reranking by the narrower copy still picks the same top-k.
    * The experiment isolates the encoding as the only variable: the
    * candidate pool is the exact fp32 top-`rerank` per query (the
    * idealized pool every ANN config converges to), and each encoding
    * re-ranks that same pool by cosine(fp32 query, dequant(enc(stored))).
    * Reported: recall@5 of the re-ranked top-5 vs the fp32 top-5, per
    * (encoding, rerank) — fp32's own row is 1.0 by construction, the
    * sanity anchor.
    *
    * Encodings:
    *  - fp16: round-to-nearest-even to an 11-bit significand. This is the
    *    PRECISION component of IEEE half; unit-scale embeddings never
    *    approach half's range limit (65504), and components under its
    *    6e-5 subnormal floor contribute O(1e-9) to a unit dot product, so
    *    significand rounding is the entire observable effect.
    *  - int8: per-vector symmetric linear quantization (scale =
    *    max|x|/127 — the standard stored-copy scheme; scale rides along
    *    as one extra float).
    *
    * Measured 2026-08-16 (this sweep, committed in NOTES_r17):
    * {{{
    * sf        rr25  fp32/fp16/int8      rr100 fp32/fp16/int8
    * sf0.001   1.000/1.000/0.973         1.000/1.000/0.973
    * sf0.01    1.000/0.987/0.987         1.000/0.987/0.987
    * sf0.1     1.000/1.000/0.987         1.000/1.000/0.987
    * }}}
    * DECISION — measured, then deliberately NOT built (the byte-codes
    * discipline): fp16 is recall-free to within one borderline pair
    * (≥ 0.987) and would halve the refine read, BUT the engine's ANN
    * gates pin a stronger property than recall — the exhaustive-probe
    * query is ROW-IDENTICAL to fp32 brute force (t126/t128/t130/t134),
    * i.e. reranked sims are EXACT. A narrowed stored copy breaks that
    * row-identity contract for a 2× read saving on ONE stage; int8 is
    * measurably lossy (0.973–0.987) on top. If a deployment wants the
    * 2×, this sweep is the standing decision harness and the change is a
    * storage-layer projection (fp16 shorts in `cells.cv`), not an
    * algorithm change.
    */
  private def refineSweep(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    def half(f: Float): Float = {
      val bits = java.lang.Float.floatToIntBits(f)
      val bias = 0x0FFF + ((bits >>> 13) & 1) // round-to-nearest-even
      java.lang.Float.intBitsToFloat((bits + bias) & ~0x1FFF)
    }
    def int8(v: Array[Float]): Array[Float] = {
      val s = v.map(math.abs).max / 127f
      if (s == 0f) v.map(_ => 0f)
      else v.map(x => math.round(x / s).toFloat * s)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    val k = 5
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf")
      val queries = emb.filter($"vec_id" < 15)
      for (rerank <- Seq(25, 100)) {
        // exact fp32 pool with both endpoint vectors attached; driver-size
        // (15 queries × rerank rows), the encodings then re-rank locally
        val pool = Similarity
          .bruteForceTopK(emb, queries, "vec_id", "embedding", rerank)
          .join(emb.select($"vec_id".as("neighbor_id"),
            $"embedding".as("cv")), Seq("neighbor_id"))
          .join(emb.select($"vec_id".as("query_id"),
            $"embedding".as("qv")), Seq("query_id"))
          .select($"query_id", $"neighbor_id", $"rank", $"qv", $"cv")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getSeq[Float](3).toArray, r.getSeq[Float](4).toArray))
        val byQuery = pool.groupBy(_._1)
        def recallOf(enc: Array[Float] => Array[Float]): Double = {
          val hits = byQuery.toSeq.map { case (_, rows) =>
            val truth = rows.filter(_._3 <= k).map(_._2).toSet
            val picked = rows
              .map { case (_, nid, _, qv, cv) => (nid, cos(qv, enc(cv))) }
              .sortBy { case (nid, sim) => (-sim, nid) }
              .take(k).map(_._1).toSet
            (picked & truth).size.toDouble / truth.size
          }
          hits.sum / hits.size
        }
        val r32 = recallOf(identity)
        val r16 = recallOf(v => v.map(half))
        val r8 = recallOf(int8)
        println(f"[$sf] refine rerank=$rerank k=$k recall@5 " +
          f"fp32=$r32%.3f fp16=$r16%.3f int8=$r8%.3f " +
          f"(bytes/dim 4 -> 2 -> 1)")
      }
    }
  }

  /** The round-18 reduced-fixture sweep: recall@5 of the PQ-tier gate
    * configs when the shared fixtures train AND assert over the 1/3
    * residue-class corpus (vec_id % 3 = 0) — run BEFORE moving
    * t119/t126/t133/t134 off the full corpus, so the re-locked floors
    * come from measurement. Shapes measured: the half-built+appended
    * residual index queried plain (t119) and filtered 1/3-of-universe
    * (t126 — now SHARING the appended fixture instead of a second full
    * build), and the OPQ layout (t133); all at np=5, rerank=100.
    */
  private def fixturesSweep(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.operators.{ProductQuantizer => PQ}
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, d).where($"vec_id" % 3 === 0)
        .localCheckpoint()
      val queries = emb.filter($"vec_id" < 9)
      def recallOf(topk: org.apache.spark.sql.DataFrame,
          corpus: org.apache.spark.sql.DataFrame): Double = {
        val bf = Similarity.bruteForceTopK(corpus, queries,
          "vec_id", "embedding", 5).localCheckpoint()
        val denom = bf.count()
        if (denom == 0) -1.0
        else topk.join(bf, Seq("query_id", "neighbor_id")).count()
          .toDouble / denom
      }
      val appDir = java.nio.file.Files
        .createTempDirectory(s"probe_fix_app").toString
      PQ.ivfPqBuildResidual(emb.where($"vec_id" % 6 === 0), "vec_id",
        "embedding", 8, 16, 16, appDir)
      PQ.ivfPqAppend(spark, appDir, emb.where($"vec_id" % 6 =!= 0),
        "vec_id", "embedding")
      val rApp = recallOf(PQ.ivfPqQuery(spark, appDir, queries, "vec_id",
        "embedding", k = 5, nProbe = 5, rerank = 100), emb)
      val allowed = emb.where($"vec_id" % 9 === 0)
      val rFilt = recallOf(PQ.ivfPqQueryFiltered(spark, appDir, queries,
          "vec_id", "embedding", allowed, "vec_id", k = 5, nProbe = 5,
          rerank = 100),
        allowed)
      val allowed10 = emb.where($"vec_id" % 30 === 0)
      val rAdapt = recallOf(PQ.ivfPqQueryFilteredAdaptive(spark, appDir,
          queries, "vec_id", "embedding", allowed10, "vec_id", k = 5,
          baseNProbe = 5, rerank = 100),
        allowed10)
      val opqDir = java.nio.file.Files
        .createTempDirectory(s"probe_fix_opq").toString
      PQ.ivfPqBuildOpq(emb, "vec_id", "embedding", 8, 16, 16, opqDir)
      val rOpq = recallOf(PQ.ivfPqQuery(spark, opqDir, queries, "vec_id",
        "embedding", k = 5, nProbe = 5, rerank = 100), emb)
      println(f"[$sf] fixtures reduced-corpus n=${emb.count()} " +
        f"append=$rApp%.3f filtered(shared-ix)=$rFilt%.3f " +
        f"adaptive1/10(shared-ix)=$rAdapt%.3f opq=$rOpq%.3f")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(appName = "gate-probe")
    if (args.contains("fixtures")) { fixturesSweep(spark); spark.stop(); return }
    if (args.contains("annfilter")) { annFilterSweep(spark); spark.stop(); return }
    if (args.contains("ann")) { annSweep(spark); spark.stop(); return }
    if (args.contains("opq")) { opqSweep(spark); spark.stop(); return }
    if (args.contains("refine")) { refineSweep(spark); spark.stop(); return }
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val docs = Tables.documents(spark, d)
      val emb = Tables.embeddings(spark, d)

      // t07: minhash vs exact global-block jaccard
      val mh = DedupOps.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
        .select($"id_a", $"id_b").cache()
      val exactJ = DedupOps.ngramJaccardPairs(
        docs.withColumn("blk", lit(1)), "doc_id", "text", groupCol = "blk",
        n = 3, threshold = 0.5)
        .select($"id_a", $"id_b").cache()
      val mhN = mh.count(); val exN = exactJ.count()
      val mhHit = mh.join(exactJ, Seq("id_a", "id_b")).count()
      val mhPhantom = mh.join(exactJ, Seq("id_a", "id_b"), "left_anti").count()
      println(s"[$sf] t07 minhash emitted=$mhN exact=$exN hits=$mhHit phantom=$mhPhantom recall=${if (exN > 0) mhHit.toDouble / exN else -1}")

      // t08: simhash 4x16 banding vs independent 8x8 banding
      val sh4 = DedupOps.simhashNearDups(docs, "doc_id", "text", maxHamming = 10)
        .cache()
      val sig = docs.select($"doc_id".as("id"), DedupOps.simhash($"text").as("sh"))
        .select($"id", $"sh", posexplode(
          transform(sequence(lit(0), lit(7)),
            c => call_function("shiftright", $"sh", c * 8).bitwiseAND(0xFFL))))
        .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "chunk_val")
      val a8 = sig.select($"id".as("id_a"), $"sh".as("sh_a"), $"chunk_idx", $"chunk_val")
      val b8 = sig.select($"id".as("id_b"), $"sh".as("sh_b"), $"chunk_idx", $"chunk_val")
      val sh8 = a8.join(b8, Seq("chunk_idx", "chunk_val"))
        .filter($"id_a" < $"id_b")
        .dropDuplicates("id_a", "id_b")
        .withColumn("hamming", bit_count($"sh_a".bitwiseXOR($"sh_b")))
        .filter($"hamming" <= 10)
        .select($"id_a", $"id_b", $"hamming").cache()
      val n4 = sh4.count(); val n8 = sh8.count()
      val eq3a = sh4.filter($"hamming" <= 3).join(sh8.filter($"hamming" <= 3), Seq("id_a", "id_b"), "left_anti").count()
      val eq3b = sh8.filter($"hamming" <= 3).join(sh4.filter($"hamming" <= 3), Seq("id_a", "id_b"), "left_anti").count()
      val sub7 = sh4.filter($"hamming" <= 7).join(sh8, Seq("id_a", "id_b"), "left_anti").count()
      println(s"[$sf] t08 simhash n4=$n4 n8=$n8 eq3diffs=$eq3a/$eq3b sub7miss=$sub7")

      // t12/t22: lsh + ivf recall vs brute force (the t25 config)
      val rec = Similarity.annRecall(emb, emb.filter($"vec_id" < 3), "vec_id",
        "embedding", k = 5, bits = 2, nCells = 8, nProbe = 5)
      rec.collect().foreach(r => println(s"[$sf] ann ${r.getString(0)} recall=${r.getDouble(1)}"))
      mh.unpersist(); exactJ.unpersist(); sh4.unpersist(); sh8.unpersist()
    }
    spark.stop()
  }
}
