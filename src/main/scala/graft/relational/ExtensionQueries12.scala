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
    ),
    // --------------------------------------------------------------- t149
    GraftQuery(
      "t149_admission_upsert",
      (s, d) => {
        import s.implicits._
        import graft.operators.{IncrementalDedup => ID, IndexFs, TextAnalysis}
        // the admission-index RE-CRAWL verb (upsertAdmission), driven
        // through the change -> revert -> re-crawl arc the crawl daemon
        // runs, asserted as invariants DuckDB cannot re-derive (hash
        // fingerprints + filesystem ledgers). Corpus: the documents
        // table; every doc admitted at batch 0, ~1/9 changed at batch 1,
        // the changed set REVERTED at batch 2.
        val base = java.nio.file.Files
          .createTempDirectory("graft_t149").toString
        val fpDir = s"$base/fp"
        val sigDir = s"$base/sig"
        val docs = graft.core.Tables.documents(s, d)
          .select($"doc_id".as("id"), $"text")
        val fpOf = TextAnalysis.fingerprint($"text")
        val adm0 = docs.select($"id", fpOf.as("fp")).localCheckpoint()
        val nDocs = adm0.count()
        adm0.select($"fp").write.mode("overwrite")
          .parquet(s"$fpDir/batch=0")
        ID.buildSigIndex(docs, $"id", $"text")
          .write.mode("overwrite").parquet(s"$sigDir/batch=0")
        ID.upsertAdmission(s, fpDir, sigDir, adm0, 0L)
        // batch 1: change ~1/9 of the corpus
        val changedDocs = docs.where($"id" % 9 === 0)
          .select($"id",
            concat($"text", lit(" zz_t149_changed zz_t149_changed"))
              .as("text")).localCheckpoint()
        val adm1 = changedDocs.select($"id", fpOf.as("fp")).localCheckpoint()
        adm1.select($"fp").write.mode("overwrite")
          .parquet(s"$fpDir/batch=1")
        ID.buildSigIndex(changedDocs, $"id", $"text")
          .write.mode("overwrite").parquet(s"$sigDir/batch=1")
        val nChanged = ID.upsertAdmission(s, fpDir, sigDir, adm1, 1L)
        def liveFp() = ID.liveIndex(s, fpDir,
          s.read.parquet(ID.readRoot(fpDir)), "fp")
          .select($"fp").as[String].collect().toSet
        def liveSig() = ID.liveIndex(s, sigDir,
          ID.applyVersionFloors(s, s"${ID.readRoot(sigDir)}/_floors",
            s.read.parquet(ID.readRoot(sigDir)), "id"), "id")
        val origFps = adm0.select($"fp").as[String].collect().toSet
        val changedFps = adm1.select($"fp").as[String].collect().toSet
        val changedOld = adm0.join(adm1.select($"id"), Seq("id"), "left_semi")
          .select($"fp").as[String].collect().toSet
        // after the change: old fps of changed pages retired, new live,
        // one live sig row per page
        val live1 = liveFp()
        val d1ok = live1 == (origFps -- changedOld) ++ changedFps
        val sig1 = liveSig()
        val s1ok = sig1.count() == nDocs &&
          sig1.groupBy($"id").count().where($"count" > 1).isEmpty
        // the REVERT: re-admission proceeds because the old fp is GONE
        // from the live view (pre-round-20 it lingered forever and the
        // revert was silently a duplicate) — mimic the daemon: delta,
        // readmit clear, hygiene
        val revertAdm = adm0.join(adm1.select($"id"), Seq("id"), "left_semi")
          .localCheckpoint()
        val revertBlocked = revertAdm.select($"fp")
          .join(liveFp().toSeq.toDF("fp"), Seq("fp"), "left_semi").count()
        revertAdm.select($"fp").write.mode("overwrite")
          .parquet(s"$fpDir/batch=2")
        ID.buildSigIndex(
            docs.join(adm1.select($"id"), Seq("id"), "left_semi"),
            $"id", $"text")
          .write.mode("overwrite").parquet(s"$sigDir/batch=2")
        ID.readmitKeys(s, fpDir, revertAdm.select($"fp"), "fp")
        val nReverted = ID.upsertAdmission(s, fpDir, sigDir, revertAdm, 2L)
        val live2 = liveFp()
        val d2ok = live2 == origFps // the full original corpus content
        val sig2 = liveSig()
        val s2ok = sig2.count() == nDocs &&
          sig2.groupBy($"id").count().where($"count" > 1).isEmpty
        // compaction makes it physical: state == current corpus, floors
        // resolved, carriers folded to one row per id
        ID.compactFpIndex(s, fpDir)
        ID.compactSigIndex(s, sigDir)
        val fpPhysical = s.read.parquet(ID.readRoot(fpDir)).count()
        val sigPhysical = s.read.parquet(ID.readRoot(sigDir)).count()
        val floorsGone = !IndexFs.exists(s"${ID.readRoot(sigDir)}/_floors")
        val carriers = s.read.parquet(s"${ID.readRoot(fpDir)}/_carriers")
        val carriersFolded = carriers
          .groupBy($"id").count().where($"count" > 1).isEmpty
        def flag(bad: Boolean, a: Long, why: String) =
          if (!bad) s.emptyDataset[(Long, Long, String)]
            .toDF("id_a", "id_b", "reason")
          else Seq((a, 0L, why)).toDF("id_a", "id_b", "reason")
        val sentinel = Seq((-1L, -1L, "sentinel")).toDF("id_a", "id_b", "reason")
        Seq(
          flag(nChanged != changedDocs.count(), nChanged,
            "change_not_fully_retired"),
          flag(!d1ok, live1.size.toLong, "live_fp_not_current_after_change"),
          flag(!s1ok, sig1.count(), "sig_versions_leak_after_change"),
          flag(revertBlocked != 0, revertBlocked,
            "revert_still_blocked_by_history"),
          flag(nReverted != revertAdm.count(), nReverted,
            "revert_not_fully_retired"),
          flag(!d2ok, live2.size.toLong, "live_fp_not_original_after_revert"),
          flag(!s2ok, sig2.count(), "sig_versions_leak_after_revert"),
          flag(fpPhysical != origFps.size.toLong, fpPhysical,
            "fp_compact_kept_history"),
          flag(sigPhysical != nDocs, sigPhysical, "sig_compact_kept_history"),
          flag(!floorsGone, -2L, "floors_survived_compaction"),
          flag(!carriersFolded, carriers.count(), "carriers_not_folded"))
          .reduce(_ unionAll _).unionAll(sentinel)
          .orderBy($"id_a", $"id_b", $"reason")
      },
      Some(AnnGates.oracle),
      doc = "Admission-index UPSERT gate (IncrementalDedup.upsertAdmission " +
        "— the re-crawl verb): a changed page's old fingerprint is " +
        "tombstoned and its superseded signature rows version-floored, so " +
        "the live admission state equals the CURRENT corpus content after " +
        "a change AND after a revert (which re-admits — the decided " +
        "semantics), compaction drops history physically, the floors " +
        "ledger dies resolved, and the carrier ledger folds to one row " +
        "per page. Violations + sentinel, constant oracle.",
      gate = true
    )
  )
}
