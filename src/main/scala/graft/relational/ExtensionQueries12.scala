package graft.relational

import graft.core.GraftQuery
import graft.operators.TextSearch
import org.apache.spark.sql.functions._

/** Round-20 wave: the batched hybrid serving path over a COMPOSED
  * (IVF-PQ residual) dense index — the round-19 verdict's top item. The
  * dense pool now routes through the layout-dispatched front door
  * ([[graft.operators.Similarity.annQuery]]), so on a composed index it
  * forms over the codes-only ADC scan + bounded exact re-rank instead of
  * reading full vectors from every probed cell. This row proves the
  * composed path VALUE-exact end-to-end: probing every cell with an
  * unbounded re-rank budget makes `ivfPqQuery` exactly brute force over
  * the live corpus (the spec-pinned exhaustive theorem), so DuckDB can
  * recompute the dense pool as brute-force cosine, the lexical pool from
  * raw text, and the fixed-order RRF sum — ranks AND doubles hash
  * cross-engine. The plan-level evidence (ADC scan reads `codes`, never
  * the vector column) lives in PlanShapeSpec/BatchedServingSpec.
  */
object ExtensionQueries12 {

  val queries: Seq[GraftQuery] = Seq(
    // --------------------------------------------------------------- t148
    GraftQuery(
      "t148_hybrid_pq",
      (s, d) => {
        import s.implicits._
        // t143's shape over the composed residual fixture (half-built +
        // appended IVF-PQ, the t119/t126/t128 target): two (terms,
        // query-vector) pairs, ONE batched lexical pass, ONE batched
        // dense call through the front door — which must dispatch to the
        // ADC engine — and ONE query-partitioned RRF fusion. nProbe = 8
        // probes all cells and rerank covers the corpus, so the dense
        // pool is exactly brute force and fully oracle-checkable.
        val lexDir = ExtensionQueries10.lexDir(s, d)
        val pqDir = AnnGates.Fixture.halfAppendedResidualDir(s, d)
        val emb = AnnGates.Fixture.reduced(s, d)
        TextSearch.hybridSearchMany(s, lexDir, pqDir,
            Seq(3L -> Seq("table", "scan"), 6L -> Seq("fast")),
            emb, "vec_id", "embedding", k = 10, poolK = 25, nProbe = 8,
            rerank = 1000000)
          .select($"query_id".cast("bigint").as("query_id"),
            $"id".cast("bigint").as("doc_id"),
            $"rank_0".as("lex_rank"), $"rank_1".as("dense_rank"),
            $"rrf_score", $"fused_rank")
          .orderBy($"query_id", $"fused_rank")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
             |dd AS (SELECT doc_id,
             |  CAST(len(t) AS BIGINT) AS dl,
             |  CAST(len(list_filter(t, x -> x = 'table')) AS BIGINT) AS tft,
             |  CAST(len(list_filter(t, x -> x = 'scan')) AS BIGINT) AS tfc,
             |  CAST(len(list_filter(t, x -> x = 'fast')) AS BIGINT) AS tff
             |  FROM tok),
             |st AS (SELECT count(*) AS n, SUM(CAST(dl AS DECIMAL(20,0))) AS sumdl,
             |  SUM(CASE WHEN tft > 0 THEN 1 ELSE 0 END) AS dft,
             |  SUM(CASE WHEN tfc > 0 THEN 1 ELSE 0 END) AS dfc,
             |  SUM(CASE WHEN tff > 0 THEN 1 ELSE 0 END) AS dff
             |  FROM dd),
             |sc AS (SELECT doc_id,
             |  ((CAST(n - dft AS DOUBLE) + 0.5) / (CAST(dft AS DOUBLE) + 0.5))
             |    * ((CAST(tft AS DOUBLE) * 2.5) / (CAST(tft AS DOUBLE)
             |        + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))) AS f_t,
             |  ((CAST(n - dfc AS DOUBLE) + 0.5) / (CAST(dfc AS DOUBLE) + 0.5))
             |    * ((CAST(tfc AS DOUBLE) * 2.5) / (CAST(tfc AS DOUBLE)
             |        + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))) AS f_c,
             |  ((CAST(n - dff AS DOUBLE) + 0.5) / (CAST(dff AS DOUBLE) + 0.5))
             |    * ((CAST(tff AS DOUBLE) * 2.5) / (CAST(tff AS DOUBLE)
             |        + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))) AS f_f,
             |  tft, tfc, tff
             |  FROM dd CROSS JOIN st),
             |lex AS (
             |  SELECT '3' AS query_id, doc_id,
             |    CAST(ROW_NUMBER() OVER (ORDER BY f_t + f_c DESC, doc_id) AS BIGINT) AS lex_rank
             |  FROM sc WHERE tft > 0 OR tfc > 0
             |  ORDER BY f_t + f_c DESC, doc_id LIMIT 25),
             |lex2 AS (
             |  SELECT '6' AS query_id, doc_id,
             |    CAST(ROW_NUMBER() OVER (ORDER BY f_f DESC, doc_id) AS BIGINT) AS lex_rank
             |  FROM sc WHERE tff > 0
             |  ORDER BY f_f DESC, doc_id LIMIT 25),
             |lexall AS (SELECT * FROM lex UNION ALL SELECT * FROM lex2),
             |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id % 3 = 0),
             |q AS (SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id IN (3, 6)),
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
      doc = "Batched hybrid retrieval over a COMPOSED (IVF-PQ residual) " +
        "index: hybridSearchMany's dense pool rides the layout-dispatched " +
        "front door (Similarity.annQuery -> codes-only ADC scan + exact " +
        "re-rank). Exhaustive probes + a corpus-covering rerank budget " +
        "make the composed query exactly brute force, so DuckDB " +
        "recomputes both pools and the RRF sum — ranks AND doubles hash " +
        "cross-engine at both SFs."
    )
  )
}
