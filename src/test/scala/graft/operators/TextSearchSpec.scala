package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "cat dog fish"),
    (2L, "cat cat cat cat cat cat cat cat"), // high tf, long doc
    (3L, "cat"), // tf 1 but shortest doc — length norm favors it
    (4L, "dog fish bird"),
    (5L, "bird bird bird")
  ).toDF("id", "text")

  test("planted relevant docs outrank non-matching ones; k respected") {
    val got = TextSearch.bm25TopK(corpus, $"id", $"text", Seq("cat"), k = 3)
      .select($"id", $"score").collect()
    assert(got.length == 3)
    val ids = got.map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L), s"only cat-docs should score > 0: ${ids}")
    // every returned score beats every excluded doc's score (they are 0)
    assert(got.forall(_.getDouble(1) > 0.0))
  }

  test("term saturation: score grows sublinearly in tf but stays monotone") {
    val df = Seq(
      (1L, "x a b c d e f g"),
      (2L, "x x a b c d e f"),
      (3L, "x x x x a b c d")
    ).toDF("id", "text")
    val byId = TextSearch.bm25TopK(df, $"id", $"text", Seq("x"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("score"))).toMap
    assert(byId(1L) < byId(2L) && byId(2L) < byId(3L), s"monotone in tf: $byId")
    // saturation: the marginal gain of tf 2->4 is below tf 1->2 times two
    assert(byId(3L) - byId(2L) < byId(2L) - byId(1L))
  }

  test("multi-term score is the sum of per-term scores") {
    val one = TextSearch.bm25TopK(corpus, $"id", $"text", Seq("cat"), k = 5)
      .select($"id", $"score".as("s1"))
    val two = TextSearch.bm25TopK(corpus, $"id", $"text", Seq("dog"), k = 5)
      .select($"id", $"score".as("s2"))
    val both = TextSearch.bm25TopK(corpus, $"id", $"text", Seq("cat", "dog"), k = 5)
      .select($"id", $"score")
    val joined = both.join(one, "id").join(two, "id")
      .select($"id", abs($"score" - ($"s1" + $"s2")).as("err")).collect()
    assert(joined.forall(_.getDouble(1) == 0.0),
      "per-term scores must add exactly (same IEEE tree)")
  }

  test("deterministic under repartition") {
    val a = TextSearch.bm25TopK(corpus, $"id", $"text", Seq("cat", "bird"), k = 5).collect()
    val b = TextSearch.bm25TopK(corpus.repartition(7), $"id", $"text", Seq("cat", "bird"), k = 5)
      .collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  private def phrase(docs: Seq[(Long, String)], terms: String*) =
    TextSearch.phraseCount(docs.toDF("id", "text"), $"id", $"text", terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("phraseCount: order matters, overlaps count, absent docs are absent") {
    val docs = Seq(
      (1L, "hash table hash table hash"),
      (2L, "table hash"),
      (3L, "hash . table"))
    // "hash table": doc 1 has positions 0,2; doc 2 has none (wrong order);
    // doc 3 has none (gap)
    assert(phrase(docs, "hash", "table") == Map(1L -> 2L))
    assert(phrase(docs, "table", "hash") == Map(1L -> 2L, 2L -> 1L))
    // overlapping single-term repeats: "hash hash" absent; "hash" alone = tf
    assert(phrase(docs, "hash") == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("phraseCount: 3-term phrase requires all offsets to line up") {
    val docs = Seq(
      (1L, "a b c a b c"),
      (2L, "a b x c"),
      (3L, "c b a"))
    assert(phrase(docs, "a", "b", "c") == Map(1L -> 2L))
  }

  test("phraseCount matches an instr-style oracle on the corpus") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val got = phrase(docs, "table", "hash")
    val want = docs.map { case (id, t) =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      id -> toks.sliding(2).count(w => w == Seq("table", "hash")).toLong
    }.filter(_._2 > 0).toMap
    assert(got == want && want.nonEmpty)
  }

  test("rrfFuse: hand-computed fusion — scores exact, nulls where a list " +
      "did not rank, ties broken on id, k caps the fused pool") {
    val l0 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val l1 = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val out = TextSearch.rrfFuse(Seq(l0, l1), k = 3)
      .orderBy($"fused_rank")
      .select($"id".as[Long], $"rank_0".as[Option[Long]],
        $"rank_1".as[Option[Long]], $"rrf_score".as[Double],
        $"fused_rank".as[Long])
      .collect().toSeq
    // 20 ranked by both: 1/62 + 1/61; 10 only by list 0: 1/61; 40 only by
    // list 1: 1/62; 30 (1/63) is cut by k = 3. EXACT doubles — the score
    // is a fixed-order sum, so the expectation is the same expression
    assert(out == Seq(
      (20L, Some(2L), Some(1L), 1.0 / 62 + 1.0 / 61, 1L),
      (10L, Some(1L), None, 1.0 / 61 + 0.0, 2L),
      (40L, None, Some(2L), 0.0 + 1.0 / 62, 3L)), out.toString)
  }

  test("rrfFuse enforces the pool contract: duplicate ids and corpus-scale " +
      "inputs fail loudly, naming the contract") {
    val ok = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    // a duplicate id would fan out through the full-outer joins and
    // silently inflate rrf_score — must be rejected, not fused
    val dup = Seq((10L, 1L), (10L, 2L), (30L, 3L)).toDF("id", "rank")
    val e = intercept[IllegalArgumentException] {
      TextSearch.rrfFuse(Seq(ok, dup), k = 5)
    }
    assert(e.getMessage.contains("duplicate id"), e.getMessage)
    // a frame past maxPoolRows is a corpus, not a top-k pool — fusing it
    // would single-partition-sort the corpus through the fused-rank window
    val big = spark.range(50).select($"id", ($"id" + 1).as("rank"))
    val e2 = intercept[IllegalArgumentException] {
      TextSearch.rrfFuse(Seq(big), k = 5, maxPoolRows = 10)
    }
    assert(e2.getMessage.contains("TOP-K CANDIDATE"), e2.getMessage)
    assert(e2.getMessage.contains("maxPoolRows"), e2.getMessage)
    // compliant pools still fuse unchanged
    assert(TextSearch.rrfFuse(Seq(ok), k = 5).count() == 2)
  }

  test("rrfFuse materializes each ranking exactly once — the contract " +
      "checks and the fusion read the same pinned rows") {
    // the hybrid path's pools are whole retrieval pipelines: executing
    // them once for validation and again for fusion doubles per-query
    // work (and a non-deterministic input could pass validation yet fuse
    // different rows) — the accumulator counts plan executions
    val acc = spark.sparkContext.longAccumulator("rrf_exec_count")
    val counted = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
      .as[(Long, Long)].map { t => acc.add(1); t }.toDF("id", "rank")
    val other = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val out = TextSearch.rrfFuse(Seq(counted, other), k = 5)
    assert(out.count() == 4)
    out.collect()
    assert(acc.value == 3L,
      s"ranking plan executed ${acc.value / 3.0} times — must be exactly once")
  }

  test("hybrid-search CLI: BM25 + persisted-ANN pools fuse end-to-end") {
    val base = java.nio.file.Files.createTempDirectory("hybrid").toString
    val ix = s"$base/ann"
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    Similarity.ivfBuild(emb, "vec_id", "embedding", 4, ix)
    graft.cli.GraftCli.run(spark, List("hybrid-search", sf0001, ix,
      s"$base/out", "0", "spark", "merge"))
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 20)
    assert(out.columns.toSet ==
      Set("id", "rank_0", "rank_1", "rrf_score", "fused_rank"))
    // both modalities contributed to the fused pool
    assert(out.where($"rank_0".isNotNull).count() > 0)
    assert(out.where($"rank_1".isNotNull).count() > 0)
    assert(out.select($"fused_rank").as[Long].collect().sorted.toSeq
      == (1L to 20L))
  }
}
