package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables.embeddings(spark, sf0001)
  private lazy val model = ProductQuantizer.train(emb, "embedding", m = 8, nCodes = 16)

  test("codes: m per vector, every code in range, deterministic under repartition") {
    val coded = emb.select($"vec_id",
      ProductQuantizer.encode($"embedding", model).as("codes"))
    assert(coded.where(size($"codes") =!= 8).count() == 0)
    assert(coded.where(exists($"codes", c => c < 0 || c >= 16)).count() == 0)
    val a = coded.as[(Long, Seq[Int])].collect().toMap
    val b = emb.repartition(13).select($"vec_id",
        ProductQuantizer.encode($"embedding", model).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
    // and a fresh train over the same frame yields the same codebooks
    // (fixed per-subspace seeds; like ivfBuild, determinism is per input
    // layout — k-means|| init samples per partition)
    val model2 = ProductQuantizer.train(emb, "embedding", 8, 16)
    assert(model2.codebooks == model.codebooks)
  }

  test("native graft_pq_adc is bit-identical to the HOF fold") {
    val df = emb.select(
      ProductQuantizer.encode($"embedding", model).as("codes"),
      ProductQuantizer.queryLut($"embedding", model).as("lut"))
    val diff = df.where(graft.expressions.GraftFunctions.pqAdc($"codes", $"lut")
      =!= ProductQuantizer.adcHof($"codes", $"lut")).count()
    assert(diff == 0)
    // self-ADC is the vector's own quantization error: non-negative and
    // small on the unit sphere (each subspace contributes its residual)
    val worst = df.select(max(graft.expressions.GraftFunctions
      .pqAdc($"codes", $"lut"))).head().getDouble(0)
    assert(worst >= 0.0 && worst < 2.0, s"self quantization error $worst")
  }

  test("pqTopKReranked: exact sims, dense ranks, k rows per query, pool >= raw-ADC recall") {
    val q = emb.filter($"vec_id" < 3)
    val topk = ProductQuantizer.pqTopKReranked(
      emb, q, "vec_id", "embedding", k = 5, model, rerank = 100)
      .localCheckpoint()
    assert(topk.groupBy($"query_id").count().as[(Long, Long)].collect()
      .forall(_._2 == 5))
    assert(topk.where($"query_id" === $"neighbor_id").count() == 0)
    // emitted sims are EXACT cosines — value identity against recompute
    val cv = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
    val qv = emb.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    assert(topk.join(cv, Seq("neighbor_id")).join(qv, Seq("query_id"))
      .where(Similarity.cosine($"qv", $"cv") =!= $"sim").count() == 0)
    // ranks dense in (sim desc, neighbor_id) order
    val ranks = topk.orderBy($"query_id", $"rank")
      .select($"query_id", $"rank").as[(Long, Long)].collect()
    ranks.groupBy(_._1).values.foreach(rs =>
      assert(rs.map(_._2).toSeq == (1L to rs.length)))
    // the exact re-rank can only improve on raw ADC head ordering: every
    // reranked hit was IN the ADC pool by construction
    val pool = ProductQuantizer.pqTopK(
      emb, q, "vec_id", "embedding", k = 100, model)
      .select($"query_id", $"neighbor_id")
    assert(topk.select($"query_id", $"neighbor_id")
      .join(pool, Seq("query_id", "neighbor_id"), "left_anti").count() == 0)
  }

  test("ivfPqBuild/ivfPqQuery: persisted model round-trips, sims exact, crashed swap heals") {
    val q = emb.filter($"vec_id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val m16 = ProductQuantizer.train(emb, "embedding", 16, 16)
    ProductQuantizer.ivfPqBuild(emb, "vec_id", "embedding", 8, m16, dir)
    // the persisted model is the model (quantizer authority round-trips)
    assert(ProductQuantizer.loadModel(spark, dir).codebooks == m16.codebooks)
    val topk = ProductQuantizer.ivfPqQuery(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 8, rerank = 100).localCheckpoint()
    assert(topk.groupBy($"query_id").count().as[(Long, Long)].collect()
      .forall(_._2 == 5))
    // emitted sims are exact cosines
    val cv = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
    val qv = emb.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    assert(topk.join(cv, Seq("neighbor_id")).join(qv, Seq("query_id"))
      .where(Similarity.cosine($"qv", $"cv") =!= $"sim").count() == 0)
    // nProbe = nCells probes every cell, so with rerank >= corpus the pool
    // IS the corpus and the refined head must EQUAL brute force exactly —
    // a theorem (exact cosine over all candidates), not a recall sample
    val all = ProductQuantizer.ivfPqQuery(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 8, rerank = 500)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select($"query_id", $"rank", $"neighbor_id")
    assert(all.select($"query_id", $"rank", $"neighbor_id")
      .exceptAll(bf).count() == 0, "exhaustive IVF-PQ must equal brute force")
    // crash window between the (future) swap renames heals on query
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(s"$dir.old"))
    assert(ProductQuantizer.ivfPqQuery(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 3).count() > 0)
  }

  test("ivfPqAppend: associative, drift-read, and ivfCompact keeps the PQ model through the swap") {
    val q = emb.filter($"vec_id" < 3)
    val half = emb.where($"vec_id" % 2 === 0)
    val rest = emb.where($"vec_id" % 2 =!= 0)
    val m16 = ProductQuantizer.train(half, "embedding", 16, 16)
    val dir1 = java.nio.file.Files.createTempDirectory("ivfpq_a1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpq_a2").toString
    ProductQuantizer.ivfPqBuild(half, "vec_id", "embedding", 8, m16, dir1)
    ProductQuantizer.ivfPqBuild(half, "vec_id", "embedding", 8, m16, dir2)
    // one-shot vs split batches: both quantizers are frozen, so assignment
    // and codes are per-vector — the grown indexes answer identically
    val st = ProductQuantizer.ivfPqAppend(spark, dir1, rest, "vec_id", "embedding")
    ProductQuantizer.ivfPqAppend(spark, dir2,
      rest.where($"vec_id" % 4 === 1), "vec_id", "embedding")
    ProductQuantizer.ivfPqAppend(spark, dir2,
      rest.where($"vec_id" % 4 === 3), "vec_id", "embedding")
    def res(dir: String) = ProductQuantizer.ivfPqQuery(spark, dir, q,
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 100)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(res(dir1) == res(dir2))
    // same-distribution append reads near ratio 1 against the build stats
    assert(st.baselineMeanL2sq.isDefined &&
      st.driftRatio.exists(r => r > 0.4 && r < 1.6), st.toString)
    // compaction must carry pq_model AND stats through the whole-dir swap —
    // losing either would brick queries / blind the drift sensor
    val before = res(dir1)
    assert(Similarity.ivfCompact(spark, dir1) == emb.count())
    assert(new java.io.File(s"$dir1/pq_model").exists(), "pq_model lost in swap")
    assert(new java.io.File(s"$dir1/stats").exists(), "stats lost in swap")
    assert(res(dir1) == before, "compaction moves bytes, never answers")
  }

  test("maxTrainRows: the capped fit is repartition-proof and the capped model keeps re-ranked recall") {
    // the cap samples by CONTENT (keyed md5 Bernoulli) and re-layouts the
    // survivors canonically, so the fitted model is a pure function of
    // the data — identical from any input partitioning (uncapped fits
    // keep the historical per-layout determinism)
    val a = ProductQuantizer.train(emb, "embedding", 8, 8, maxTrainRows = 200)
    val b = ProductQuantizer.train(emb.repartition(13), "embedding", 8, 8,
      maxTrainRows = 200)
    val c = ProductQuantizer.train(
      emb.repartition(3).sortWithinPartitions($"vec_id".desc), "embedding",
      8, 8, maxTrainRows = 200)
    assert(a.codebooks == b.codebooks && b.codebooks == c.codebooks,
      "capped fit must not depend on the input layout")
    // a capped fit at the t117 shape still clears the production floor:
    // quantizer training needs a sample, not the corpus — the re-rank
    // recovers what the coarser codebooks lose
    val q = emb.filter($"vec_id" < 3)
    val capped = ProductQuantizer.train(emb, "embedding", 16, 16,
      maxTrainRows = 250)
    val topk = ProductQuantizer.pqTopKReranked(emb, q, "vec_id", "embedding",
      k = 5, capped, rerank = 100)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").localCheckpoint()
    val r = topk.select($"query_id", $"neighbor_id")
      .join(bf, Seq("query_id", "neighbor_id")).count().toDouble / bf.count()
    info(f"capped (250/500) pq re-ranked recall@5: $r%.3f")
    // measured 0.933 — the capped fit matches uncapped recall within the
    // t117 gate floor (0.8), which is the verdict's "done" criterion
    assert(r >= 0.8, f"capped-fit recall $r%.3f under the t117 floor")
    // coarse cap on the IVF build: the exhaustive theorem is INDEPENDENT
    // of coarse-quantizer quality, so a sample-trained index still answers
    // brute-force-exactly when every cell is probed — and the build is
    // repartition-proof end to end (identical centroid tables)
    val d1 = java.nio.file.Files.createTempDirectory("ivf_cap1").toString
    val d2 = java.nio.file.Files.createTempDirectory("ivf_cap2").toString
    Similarity.ivfBuild(emb, "vec_id", "embedding", 8, d1, maxTrainRows = 200)
    Similarity.ivfBuild(emb.repartition(11), "vec_id", "embedding", 8, d2,
      maxTrainRows = 200)
    assert(spark.read.parquet(s"$d1/centroids").orderBy($"cell")
        .collect().toSeq ==
      spark.read.parquet(s"$d2/centroids").orderBy($"cell").collect().toSeq)
    val exhaustive = Similarity.ivfQuery(spark, d1, q, "vec_id", "embedding",
      k = 5, nProbe = 8)
    val bfFull = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select($"query_id", $"rank", $"neighbor_id")
    assert(exhaustive.select($"query_id", $"rank", $"neighbor_id")
      .exceptAll(bfFull).count() == 0)
  }

  test("residual layout: lower distortion than raw at the same code budget, exhaustive theorem, append associativity") {
    val q = emb.filter($"vec_id" < 3)
    val rawDir = java.nio.file.Files.createTempDirectory("ivfpq_raw").toString
    val resDir = java.nio.file.Files.createTempDirectory("ivfpq_res").toString
    ProductQuantizer.ivfPqBuild(emb, "vec_id", "embedding", 8,
      ProductQuantizer.train(emb, "embedding", 8, 16), rawDir)
    val resModel = ProductQuantizer.ivfPqBuildResidual(
      emb, "vec_id", "embedding", 8, 8, 16, resDir)
    assert(resModel.encoding == "residual")
    assert(ProductQuantizer.loadModel(spark, resDir).encoding == "residual")
    // codes well-formed
    val cells = spark.read.parquet(s"$resDir/cells")
    assert(cells.where(size($"codes") =!= 8).count() == 0)
    assert(cells.where(exists($"codes", c => c < 0 || c >= 16)).count() == 0)
    // the variance-concentration claim AS A NUMBER: mean self-ADC
    // distortion (||prepared − decode(codes)||², what ADC ranking carries
    // as noise) must be LOWER under residual encoding at the same
    // (m, nCodes) — subtracting the coarse component leaves the codebooks
    // less variance to spend their 16 entries on
    def distortion(dir: String): Double = {
      val model = ProductQuantizer.loadModel(spark, dir)
      val cen = spark.read.parquet(s"$dir/centroids")
        .orderBy("cell").select("centroid").collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble))
      val lut =
        if (model.encoding == "residual")
          ProductQuantizer.queryLutResidual($"cv", $"cell", model, cen)
        else ProductQuantizer.queryLut($"cv", model)
      spark.read.parquet(s"$dir/cells")
        .select(graft.expressions.GraftFunctions.pqAdc($"codes", lut).as("d"))
        .agg(avg($"d")).head().getDouble(0)
    }
    val (dRaw, dRes) = (distortion(rawDir), distortion(resDir))
    assert(dRes < dRaw,
      s"residual distortion $dRes must undercut raw $dRaw at matched budget")
    // exhaustive theorem holds under the residual encoding too: probe all
    // cells + pool >= corpus => exact refine IS brute force (the encoding
    // only shapes the pool, and the pool is everything)
    val all = ProductQuantizer.ivfPqQuery(spark, resDir, q, "vec_id",
      "embedding", k = 5, nProbe = 8, rerank = 500)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select($"query_id", $"rank", $"neighbor_id")
    assert(all.select($"query_id", $"rank", $"neighbor_id")
      .exceptAll(bf).count() == 0, "exhaustive residual IVF-PQ != brute force")
    // append associativity under the residual encoding: both quantizers
    // AND the anchors are frozen float-table functions, so split appends
    // write bit-identical codes
    val half = emb.where($"vec_id" % 2 === 0)
    val rest = emb.where($"vec_id" % 2 =!= 0)
    val d1 = java.nio.file.Files.createTempDirectory("ivfpq_res_a1").toString
    val d2 = java.nio.file.Files.createTempDirectory("ivfpq_res_a2").toString
    ProductQuantizer.ivfPqBuildResidual(half, "vec_id", "embedding", 8, 8, 16, d1)
    ProductQuantizer.ivfPqBuildResidual(half, "vec_id", "embedding", 8, 8, 16, d2)
    ProductQuantizer.ivfPqAppend(spark, d1, rest, "vec_id", "embedding")
    ProductQuantizer.ivfPqAppend(spark, d2,
      rest.where($"vec_id" % 4 === 1), "vec_id", "embedding")
    ProductQuantizer.ivfPqAppend(spark, d2,
      rest.where($"vec_id" % 4 === 3), "vec_id", "embedding")
    def res(dir: String) = ProductQuantizer.ivfPqQuery(spark, dir, q,
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 100)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(res(d1) == res(d2))
    // appended codes are bit-identical to build-time codes for the same
    // vectors (the float-anchor authority rule): compare the appended
    // half's codes in d1 against a from-scratch build's... the coarse
    // fits differ (half vs full corpus), so instead pin per-vector purity:
    // re-encoding any stored row from its stored (cv, cell) reproduces
    // its stored codes exactly
    val model1 = ProductQuantizer.loadModel(spark, d1)
    val cen1 = spark.read.parquet(s"$d1/centroids")
      .orderBy("cell").select("centroid").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val mismatch = spark.read.parquet(s"$d1/cells")
      .where(ProductQuantizer.encodeResidual($"cv", $"cell", model1, cen1)
        =!= $"codes").count()
    assert(mismatch == 0, "stored codes must be a pure function of (cv, cell)")
  }

  test("opq layout: orthogonal rotation persists and round-trips; codes stay a pure function " +
      "of (cv, cell); exhaustive theorem and append associativity hold; legacy rotation is None") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_opq").toString
    val model = ProductQuantizer.ivfPqBuildOpq(
      emb, "vec_id", "embedding", 8, 8, 16, dir)
    assert(model.encoding == "opq" && model.rotation.isDefined)
    // the persisted model (rotation included) round-trips EXACTLY
    assert(ProductQuantizer.loadModel(spark, dir) == model)
    // the rotation is orthogonal (R·Rᵀ = I): rotated ADC answers the same
    // geometric question as unrotated — distances are preserved
    val r = model.rotation.get
    val d = r.size
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => r(i)(k) * r(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"rotation not orthogonal at ($i,$j): $dot")
    }
    // codes well-formed and a pure function of (cv, cell) through the
    // model — the rotation rides the model, so re-encoding any stored row
    // reproduces its stored codes bit-exactly
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.where(size($"codes") =!= 8).count() == 0)
    assert(cells.where(exists($"codes", c => c < 0 || c >= 16)).count() == 0)
    val cen = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").select("centroid").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    assert(cells.where(ProductQuantizer.encodeResidual(
      $"cv", $"cell", model, cen) =!= $"codes").count() == 0)
    // exhaustive theorem: all probes + pool >= corpus => brute force
    val q = emb.filter($"vec_id" < 3)
    val all = ProductQuantizer.ivfPqQuery(spark, dir, q, "vec_id",
      "embedding", k = 5, nProbe = 8, rerank = 500)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select($"query_id", $"rank", $"neighbor_id")
    assert(all.select($"query_id", $"rank", $"neighbor_id")
      .exceptAll(bf).count() == 0, "exhaustive opq IVF-PQ != brute force")
    // append associativity: rotation + codebooks + anchors are all frozen
    // model state, so split appends write bit-identical layouts
    val half = emb.where($"vec_id" % 2 === 0)
    val rest = emb.where($"vec_id" % 2 =!= 0)
    val d1 = java.nio.file.Files.createTempDirectory("ivfpq_opq_a1").toString
    val d2 = java.nio.file.Files.createTempDirectory("ivfpq_opq_a2").toString
    ProductQuantizer.ivfPqBuildOpq(half, "vec_id", "embedding", 8, 8, 16, d1)
    ProductQuantizer.ivfPqBuildOpq(half, "vec_id", "embedding", 8, 8, 16, d2)
    assert(ProductQuantizer.loadModel(spark, d1).encoding == "opq")
    ProductQuantizer.ivfPqAppend(spark, d1, rest, "vec_id", "embedding")
    ProductQuantizer.ivfPqAppend(spark, d2,
      rest.where($"vec_id" % 4 === 1), "vec_id", "embedding")
    ProductQuantizer.ivfPqAppend(spark, d2,
      rest.where($"vec_id" % 4 === 3), "vec_id", "embedding")
    def res(dd: String) = ProductQuantizer.ivfPqQuery(spark, dd, q,
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 100)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(res(d1) == res(d2))
    // rebuild keeps the opq encoding and re-trains the rotation
    assert(ProductQuantizer.ivfPqRebuild(spark, d1, 8) == emb.count())
    val rebuilt = ProductQuantizer.loadModel(spark, d1)
    assert(rebuilt.encoding == "opq" && rebuilt.rotation.isDefined)
    // unrotated layouts load with rotation None (version tolerance)
    val resDir = java.nio.file.Files.createTempDirectory("ivfpq_res_leg").toString
    ProductQuantizer.ivfPqBuildResidual(half, "vec_id", "embedding", 4, 8, 8, resDir)
    assert(ProductQuantizer.loadModel(spark, resDir).rotation.isEmpty)
  }

  test("pre-residual pq_model (no encoding column) still loads and queries as raw") {
    val q = emb.filter($"vec_id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_legacy").toString
    ProductQuantizer.ivfPqBuild(emb, "vec_id", "embedding", 8,
      ProductQuantizer.train(emb, "embedding", 8, 16), dir)
    val before = ProductQuantizer.ivfPqQuery(spark, dir, q, "vec_id",
      "embedding", k = 5, nProbe = 8, rerank = 100)
      .orderBy($"query_id", $"rank").collect().toSeq
    // simulate an index persisted before the layout-version marker:
    // strip the encoding column from pq_model
    val legacy = spark.read.parquet(s"$dir/pq_model")
      .drop("encoding").localCheckpoint()
    legacy.write.mode("overwrite").parquet(s"$dir/pq_model")
    val m = ProductQuantizer.loadModel(spark, dir)
    assert(m.encoding == "raw")
    val after = ProductQuantizer.ivfPqQuery(spark, dir, q, "vec_id",
      "embedding", k = 5, nProbe = 8, rerank = 100)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(after == before, "a pre-marker index must answer unchanged")
  }

  test("ivfPqRebuild re-trains BOTH quantizers, keeps the PQ layout, resets the drift baseline") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_rb").toString
    val half = emb.where($"vec_id" % 2 === 0)
    ProductQuantizer.ivfPqBuild(half, "vec_id", "embedding", 8,
      ProductQuantizer.train(half, "embedding", 16, 16), dir)
    // append a SHIFTED second half: heavy drift under the frozen quantizers
    val shifted = emb.where($"vec_id" % 2 =!= 0)
      .select($"vec_id", transform($"embedding",
        x => (x + lit(0.5f)).cast("float")).as("embedding"))
    val before = ProductQuantizer.ivfPqAppend(spark, dir, shifted,
      "vec_id", "embedding")
    assert(before.driftRatio.exists(_ > 1.5), before.toString)
    // rebuild: both quantizers re-trained on the union, swap atomic; the
    // PQ storage contract (m, nCodes) carries over from the live model
    assert(ProductQuantizer.ivfPqRebuild(spark, dir, nCells = 8) == emb.count())
    assert(!new java.io.File(s"$dir.rebuild").exists())
    assert(!new java.io.File(s"$dir.old").exists())
    // the rebuild committed a new GENERATION — resolve before reading
    val rebuiltRoot = IncrementalDedup.readRoot(dir)
    val rebuilt = ProductQuantizer.loadModel(spark, rebuiltRoot)
    assert(rebuilt.m == 16 && rebuilt.nCodes == 16)
    assert(spark.read.parquet(s"$rebuiltRoot/cells").count() == emb.count())
    assert(ProductQuantizer.ivfPqQuery(spark, dir, emb.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 100).count() > 0)
    // re-baselined stats: the same shifted distribution now reads
    // in-distribution (the new quantizers have seen it)
    val after = ProductQuantizer.ivfPqAppend(spark, dir,
      shifted.select(($"vec_id" + 50000L).as("vec_id"), $"embedding"),
      "vec_id", "embedding")
    assert(after.driftRatio.exists(r => r > 0.3 && r < 1.5), after.toString)
  }
}
