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
    val rebuilt = ProductQuantizer.loadModel(spark, dir)
    assert(rebuilt.m == 16 && rebuilt.nCodes == 16)
    assert(spark.read.parquet(s"$dir/cells").count() == emb.count())
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
