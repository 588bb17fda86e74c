package graft.relational

import graft.core.{GraftQuery, Tables}
import graft.operators.{IncrementalDedup, IndexFs, Similarity}
import org.apache.spark.sql.functions._

/** Round-16 wave: the index-lifecycle DELETE arc and the
  * incremental-release surfaces (manifest append, prefetched sequential
  * read). Same contract as [[ExtensionQueries]]: Spark-first builder +
  * DuckDB oracle (or a constant-gate verdict for non-SQL-expressible
  * soundness harnesses) that must hash-match exactly at sf0.01/sf0.001.
  */
object ExtensionQueries8 {

  val queries: Seq[GraftQuery] = Seq(
    // --------------------------------------------------------------- t130
    GraftQuery(
      "t130_ann_delete",
      (s, d) => {
        import s.implicits._
        // the delete arc as a GATE: tombstone a fifth of a persisted IVF
        // index, then verify every contract at once — (1) no deleted id
        // surfaces from the query path; (2) at nProbe = nCells the
        // tombstoned index is ROW-IDENTICAL to brute force over the
        // surviving corpus (deletion ≡ the index never held the ids);
        // (3) compaction physically drops exactly the tombstoned rows and
        // clears the tombstone table. A dedicated (non-fixture) index —
        // deletion mutates, so sharing would poison other gates; the
        // build is one capped coarse fit + one assignment pass.
        val emb = graft.core.Tables.embeddings(s, d)
        val dir = java.nio.file.Files
          .createTempDirectory("graft_t130").toString + "/idx"
        Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8, dir)
        val delIds = emb.where($"vec_id" % 5 === 1)
          .select($"vec_id").localCheckpoint()
        val nDel = Similarity.ivfDelete(s, dir, delIds, "vec_id")
        val queries = emb.orderBy($"vec_id").limit(4)

        val exhaustive = Similarity.ivfQuery(s, dir, queries,
          "vec_id", "embedding", k = 5, nProbe = 8).localCheckpoint()
        val surfaced = exhaustive
          .join(delIds.select($"vec_id".as("neighbor_id")),
            Seq("neighbor_id"), "left_semi")
          .select($"query_id".as("id_a"), $"neighbor_id".as("id_b"),
            lit("deleted_surfaced").as("reason"))
        val bf = Similarity.bruteForceTopK(
          emb.join(delIds, Seq("vec_id"), "left_anti"), queries,
          "vec_id", "embedding", k = 5).localCheckpoint()
        val extra = exhaustive.exceptAll(bf)
          .select($"query_id".as("id_a"), $"neighbor_id".as("id_b"),
            lit("extra_vs_surviving_bruteforce").as("reason"))
        val missing = bf.exceptAll(exhaustive)
          .select($"query_id".as("id_a"), $"neighbor_id".as("id_b"),
            lit("missing_vs_surviving_bruteforce").as("reason"))

        val compacted = Similarity.ivfCompact(s, dir)
        // the compact committed a new GENERATION — post-compact state
        // lives under the resolved root, not the (grace-retained) old one
        val postRoot = graft.operators.IncrementalDedup.readRoot(dir)
        val expectLive = emb.count() - nDel
        val compactBad =
          if (compacted == expectLive && !IndexFs.exists(s"$postRoot/tombstones"))
            s.emptyDataset[(Long, Long, String)].toDF("id_a", "id_b", "reason")
          else Seq((compacted, expectLive, "compact_mismatch"))
            .toDF("id_a", "id_b", "reason")
        val survived = s.read.parquet(s"$postRoot/cells")
          .join(delIds.select($"vec_id".as("neighbor_id")),
            Seq("neighbor_id"), "left_semi")
          .select($"neighbor_id".as("id_a"), lit(-3L).as("id_b"),
            lit("row_survived_compact").as("reason"))

        val sentinel = Seq((-1L, -1L, "sentinel")).toDF("id_a", "id_b", "reason")
        surfaced.unionAll(extra).unionAll(missing).unionAll(compactBad)
          .unionAll(survived).unionAll(sentinel)
          .orderBy($"id_a", $"id_b", $"reason")
      },
      Some(AnnGates.oracle),
      doc = "ANN deletion gate (Similarity.ivfDelete): tombstoned ids " +
        "never surface, the exhaustive-probe query over the tombstoned " +
        "index is row-identical to brute force over the surviving corpus " +
        "(deletion ≡ the index never held them), and ivfCompact " +
        "physically drops exactly the tombstoned rows and clears the " +
        "table; violations + sentinel, constant oracle.",
      gate = true
    ),
    // --------------------------------------------------------------- t131
    GraftQuery(
      "t131_manifest_append",
      (s, d) => {
        import s.implicits._
        // incremental sealing as a GATE: seal generation 1, grow the
        // release, APPEND-seal — the combined manifest must be
        // entry-for-entry what a fresh full seal over the grown release
        // records (same files, bytes, rows, digests, page signatures),
        // and every verify tier must read the two-generation release
        // all-ok. At 100 TB this is the difference between sealing the
        // delta and re-streaming the world.
        val docs = graft.core.Tables.documents(s, d)
          .select($"doc_id", $"lang", $"text")
        val dir = java.nio.file.Files
          .createTempDirectory("graft_t131").toString + "/rel"
        docs.where($"doc_id" % 2 === 0).repartition(2).write.parquet(dir)
        graft.sinks.DatasetManifest.write(s, dir)
        docs.where($"doc_id" % 2 =!= 0).repartition(2)
          .write.mode("append").parquet(dir)
        val appended = graft.sinks.DatasetManifest.append(s, dir)
          .localCheckpoint()
        val fresh = graft.sinks.DatasetManifest.manifest(s, dir)
          .localCheckpoint()
        val drift = appended.exceptAll(fresh).unionAll(fresh.exceptAll(appended))
          .select($"file", lit("append_vs_fresh_seal").as("reason"))
        val notOk = Seq("full", "sampled", "quick").map(mode =>
          graft.sinks.DatasetManifest.verify(s, dir, mode = mode)
            .where($"status" =!= "ok")
            .select($"file", concat(lit(s"$mode:"), $"status").as("reason")))
          .reduce(_ unionAll _)
        val sentinel = Seq(("sentinel", "sentinel")).toDF("file", "reason")
        drift.unionAll(notOk).unionAll(sentinel)
          .orderBy($"file", $"reason")
      },
      Some("SELECT 'sentinel' AS file, 'sentinel' AS reason"),
      doc = "Incremental release sealing gate (DatasetManifest.append): " +
        "seal + grow + append-seal is entry-identical to a fresh full " +
        "seal of the grown release (the delta is digested, history is " +
        "carried verbatim), and all three verify tiers read the " +
        "two-generation release clean; violations + sentinel, constant " +
        "oracle.",
      gate = true
    ),
    // --------------------------------------------------------------- t132
    GraftQuery(
      "t132_shard_prefetch_read",
      (s, d) => {
        import s.implicits._
        // t129's oracle through the PREFETCHED loader: the read-ahead
        // iterator (one in-flight fetch beside the batch being drained,
        // across shard boundaries) must emit value-for-value the rows the
        // rank-range writer laid down — replayed independently by DuckDB.
        val ordered = graft.operators.TrainingOrder
          .interleave(Tables.documents(s, d), $"lang", $"doc_id",
            Seq("de", "en", "es", "fr", "zh"))
        val dir = java.nio.file.Files
          .createTempDirectory("graft_t132").toString
        graft.operators.TrainingOrder
          .writeMixtureShards(ordered, $"global_pos", s"$dir/shards", 8)
        val schema = s.read.parquet(s"$dir/shards").schema
        val rows = graft.operators.TrainingOrder.shardRangeIterator(
          s, s"$dir/shards", 0, 7, verify = "off", prefetch = true).toList
        import scala.jdk.CollectionConverters._
        s.createDataFrame(rows.asJava, schema)
          .select($"doc_id", $"lang", $"global_pos",
            $"shard".cast("int").as("shard"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, lang,
             |    md5('0:' || CAST(doc_id AS VARCHAR)) AS skey,
             |    CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2
             |      WHEN 'fr' THEN 3 WHEN 'zh' THEN 4 END AS source_idx
             |  FROM documents),
             |o AS (SELECT doc_id, lang,
             |    CAST((row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) - 1) * 5
             |      + source_idx AS BIGINT) AS global_pos
             |  FROM t WHERE source_idx IS NOT NULL)
             |SELECT doc_id, lang, global_pos,
             |  CAST((row_number() OVER (ORDER BY global_pos) - 1) * 8
             |    // (SELECT count(*) FROM o) AS INT) AS shard
             |FROM o ORDER BY doc_id""".stripMargin),
      doc = "Prefetched sequential shard read " +
        "(TrainingOrder.shardRangeIterator with one-chunk read-ahead): " +
        "the training-loader iterator that hides part-boundary latency " +
        "reads back value-for-value what writeMixtureShards laid down — " +
        "t129's DuckDB replay through the prefetch path."
    ),
    // --------------------------------------------------------------- t133
    GraftQuery(
      "t133_ivfpq_opq",
      (s, d) => {
        import s.implicits._
        // the OPQ encoding's end-to-end gate at the production query shape
        // (np=5, rerank=100, the t126 config on the ROTATED layout):
        // sims exact, ranks dense, no self/dups, recall@5 vs brute force
        // over the fixture corpus >= 0.6 (the REDUCED residue class since
        // round-18; re-measured there: 0.933/0.933/0.867 across
        // sf0.001/0.01/0.1 — GateProbe fixtures sweep). The encoding
        // earned its layout from the round-16 GateProbe opq sweep — pool
        // recall ties-or-ahead of plain residual at every config
        // (np5/rr25: 0.733→0.787 / 0.720→0.733 / 0.653→0.707; full table
        // in NOTES_r16), which at 100 TB is comparable recall from a
        // smaller full-vector refine read.
        val emb = AnnGates.Fixture.reduced(s, d)
        val queries = emb.filter($"vec_id" < 9)
        val dir = AnnGates.Fixture.opqDir(s, d)
        val topk = graft.operators.ProductQuantizer.ivfPqQuery(s, dir,
          queries, "vec_id", "embedding", k = 5, nProbe = 5, rerank = 100)
        AnnGates.verdict(emb, queries, topk, k = 5, recallFloor = 0.6)
      },
      Some(AnnGates.oracle),
      doc = "OPQ IVF-PQ gate (ivfPqBuildOpq — PCA-permutation-rotated " +
        "residual codes): the composed query path over the rotated layout " +
        "emits exact sims, dense ranks, no self/dup violations, and " +
        "recall@5 >= 0.6 at the production (np=5, rerank=100) config; " +
        "violations + sentinel, constant oracle.",
      gate = true
    )
  )
}
