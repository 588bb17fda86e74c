package graft.relational

import graft.core.GraftQuery
import graft.operators.{Similarity, TextSearch}
import org.apache.spark.sql.functions._

/** Round-19 wave: BATCHED dense-ANN and hybrid serving — the evaluation /
  * production shape where queries arrive in batches and the driver must
  * pay a FIXED number of jobs regardless of batch size. Both rows carry
  * FULL DuckDB value oracles: the dense fixture probes every cell
  * (nProbe = nCells), so its answers are exactly brute force over the
  * live corpus and DuckDB can recompute ranks AND doubles cross-engine;
  * the hybrid row layers the t141 batched-lexical recipe and the
  * fixed-order RRF sum on top.
  */
object ExtensionQueries11 {

  val queries: Seq[GraftQuery] = Seq(
    // --------------------------------------------------------------- t142
    GraftQuery(
      "t142_ann_batch",
      (s, d) => {
        import s.implicits._
        // BATCHED dense serving: three query vectors in ONE ivfQuery call
        // — one union-of-probed-cells read, one probe collect, one
        // scoring plan with a query-partitioned rank window (the t141
        // recipe on the vector side; job-count constancy is spec-pinned
        // in BatchedServingSpec). nProbe = nCells = 8 makes the call
        // EXHAUSTIVE, so the oracle recomputes it as brute-force cosine
        // over the reduced corpus — ranks and sims bit-exact.
        val dir = AnnGates.Fixture.ivfReducedDir(s, d)
        val emb = AnnGates.Fixture.reduced(s, d)
        val qs = emb.where($"vec_id".isin(0L, 9L, 21L))
        Similarity.ivfQuery(s, dir, qs, "vec_id", "embedding",
            k = 10, nProbe = 8)
          .select($"query_id".cast("bigint").as("query_id"), $"rank",
            $"neighbor_id".cast("bigint").as("neighbor_id"), $"sim")
          .orderBy($"query_id", $"rank")
      },
      Some("""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id % 3 = 0),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM c
             |  WHERE vec_id IN (0, 9, 21)),
             |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
             |    list_dot_product(q.qv, c.v)
             |      / (sqrt(list_dot_product(q.qv, q.qv))
             |         * sqrt(list_dot_product(c.v, c.v))) AS sim
             |  FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id),
             |r AS (SELECT query_id, neighbor_id, sim,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
             |  FROM sc)
             |SELECT CAST(query_id AS BIGINT) AS query_id, rank,
             |  CAST(neighbor_id AS BIGINT) AS neighbor_id, sim
             |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin),
      doc = "Batched dense-ANN serving: three query vectors in ONE " +
        "ivfQuery call over a persisted IVF index — one read of the " +
        "union of the queries' probed cells, one probe collect, one " +
        "query-partitioned rank window; driver jobs constant in the " +
        "query count. Probing every cell makes the call exhaustive, so " +
        "the oracle recomputes it as brute-force cosine — ranks AND " +
        "doubles hash cross-engine."
    ),
    // --------------------------------------------------------------- t143
    GraftQuery(
      "t143_hybrid_batch",
      (s, d) => {
        import s.implicits._
        // BATCHED hybrid end-to-end: two (terms, query-vector) pairs
        // served by ONE batched-lexical pass (bm25TopKFromIndexMany over
        // the persisted lexical index), ONE batched dense call (ivfQuery,
        // exhaustive on the 8-cell fixture), and ONE query-partitioned
        // RRF fusion — fixed driver jobs regardless of the batch size.
        // The oracle recomputes both pools per query from raw data and
        // folds the fixed-order RRF sum — ranks AND doubles cross-engine.
        val lexDir = ExtensionQueries10.lexDir(s, d)
        val annDir = AnnGates.Fixture.ivfReducedDir(s, d)
        val emb = AnnGates.Fixture.reduced(s, d)
        TextSearch.hybridSearchMany(s, lexDir, annDir,
            Seq(0L -> Seq("spark", "merge"), 9L -> Seq("window")),
            emb, "vec_id", "embedding", k = 10, poolK = 25, nProbe = 8)
          .select($"query_id".cast("bigint").as("query_id"),
            $"id".cast("bigint").as("doc_id"),
            $"rank_0".as("lex_rank"), $"rank_1".as("dense_rank"),
            $"rrf_score", $"fused_rank")
          .orderBy($"query_id", $"fused_rank")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
             |dd AS (SELECT doc_id,
             |  CAST(len(t) AS BIGINT) AS dl,
             |  CAST(len(list_filter(t, x -> x = 'spark')) AS BIGINT) AS tfs,
             |  CAST(len(list_filter(t, x -> x = 'merge')) AS BIGINT) AS tfm,
             |  CAST(len(list_filter(t, x -> x = 'window')) AS BIGINT) AS tfw
             |  FROM tok),
             |st AS (SELECT count(*) AS n, SUM(CAST(dl AS DECIMAL(20,0))) AS sumdl,
             |  SUM(CASE WHEN tfs > 0 THEN 1 ELSE 0 END) AS dfs,
             |  SUM(CASE WHEN tfm > 0 THEN 1 ELSE 0 END) AS dfm,
             |  SUM(CASE WHEN tfw > 0 THEN 1 ELSE 0 END) AS dfw
             |  FROM dd),
             |sc AS (SELECT doc_id,
             |  ((CAST(n - dfs AS DOUBLE) + 0.5) / (CAST(dfs AS DOUBLE) + 0.5))
             |    * ((CAST(tfs AS DOUBLE) * 2.5) / (CAST(tfs AS DOUBLE)
             |        + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))) AS f_s,
             |  ((CAST(n - dfm AS DOUBLE) + 0.5) / (CAST(dfm AS DOUBLE) + 0.5))
             |    * ((CAST(tfm AS DOUBLE) * 2.5) / (CAST(tfm AS DOUBLE)
             |        + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))) AS f_m,
             |  ((CAST(n - dfw AS DOUBLE) + 0.5) / (CAST(dfw AS DOUBLE) + 0.5))
             |    * ((CAST(tfw AS DOUBLE) * 2.5) / (CAST(tfw AS DOUBLE)
             |        + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))) AS f_w,
             |  tfs, tfm, tfw
             |  FROM dd CROSS JOIN st),
             |lex AS (
             |  SELECT '0' AS query_id, doc_id,
             |    CAST(ROW_NUMBER() OVER (ORDER BY f_s + f_m DESC, doc_id) AS BIGINT) AS lex_rank
             |  FROM sc WHERE tfs > 0 OR tfm > 0
             |  ORDER BY f_s + f_m DESC, doc_id LIMIT 25),
             |lex2 AS (
             |  SELECT '9' AS query_id, doc_id,
             |    CAST(ROW_NUMBER() OVER (ORDER BY f_w DESC, doc_id) AS BIGINT) AS lex_rank
             |  FROM sc WHERE tfw > 0
             |  ORDER BY f_w DESC, doc_id LIMIT 25),
             |lexall AS (SELECT * FROM lex UNION ALL SELECT * FROM lex2),
             |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id % 3 = 0),
             |q AS (SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id IN (0, 9)),
             |sims AS (SELECT q.qid, c.vec_id AS doc_id,
             |    list_dot_product(q.qv, c.v)
             |      / (sqrt(list_dot_product(q.qv, q.qv))
             |         * sqrt(list_dot_product(c.v, c.v))) AS sim
             |  FROM c CROSS JOIN q WHERE c.vec_id <> q.qid),
             |dense AS (SELECT CAST(qid AS VARCHAR) AS query_id, doc_id, dense_rank FROM (
             |    SELECT qid, doc_id, sim,
             |      CAST(ROW_NUMBER() OVER (PARTITION BY qid
             |        ORDER BY sim DESC, doc_id) AS BIGINT) AS dense_rank
             |    FROM sims) WHERE dense_rank <= 25),
             |fused AS (SELECT COALESCE(l.query_id, de.query_id) AS query_id,
             |    COALESCE(l.doc_id, de.doc_id) AS doc_id,
             |    l.lex_rank, de.dense_rank,
             |    COALESCE(1.0 / (60 + l.lex_rank), 0.0)
             |      + COALESCE(1.0 / (60 + de.dense_rank), 0.0) AS rrf_score
             |  FROM lexall l FULL OUTER JOIN dense de
             |    ON l.query_id = de.query_id AND l.doc_id = de.doc_id),
             |ranked AS (SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             |      ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank
             |  FROM fused)
             |SELECT CAST(query_id AS BIGINT) AS query_id,
             |  CAST(doc_id AS BIGINT) AS doc_id, lex_rank, dense_rank,
             |  rrf_score, fused_rank
             |FROM ranked WHERE fused_rank <= 10
             |ORDER BY query_id, fused_rank""".stripMargin),
      doc = "Batched hybrid retrieval end-to-end (hybridSearchMany): two " +
        "(terms, query-vector) pairs served by one batched-lexical pass " +
        "over the persisted BM25 index, one batched dense call over the " +
        "persisted IVF index (exhaustive on the fixture, so DuckDB can " +
        "recompute it), and one query-partitioned RRF fusion — driver " +
        "jobs constant in the batch size; ranks AND rrf doubles hash " +
        "cross-engine."
    )
  )
}
