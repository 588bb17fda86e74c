package graft.relational

import graft.core.{GraftQuery, Tables}
import graft.operators.{AnnMaintenance, IndexFs, Similarity}
import org.apache.spark.sql.functions._

/** Round-17 wave: the tombstone-pressure maintenance policy — the
  * operational closure of the round-16 delete arc. Deletions now resolve
  * physically by POLICY ([[graft.operators.AnnMaintenance.maintain]]'s
  * tombstone sensor), not by an operator remembering to run a compact,
  * and the tombstone table itself is file-bounded (the drift_log fold
  * discipline applied to takedown batches). Same contract as
  * [[ExtensionQueries]]: constant-gate verdict frames that must
  * hash-match exactly at sf0.01/sf0.001.
  */
object ExtensionQueries9 {

  val queries: Seq[GraftQuery] = Seq(
    // --------------------------------------------------------------- t134
    GraftQuery(
      "t134_tombstone_policy",
      (s, d) => {
        import s.implicits._
        // the tombstone LIFECYCLE as a gate: (1) takedown batches past
        // the fold budget leave a BOUNDED tombstone file count; (2) no
        // deleted id surfaces from the query path while tombstones are
        // pending; (3) tombstone pressure fires maintain's COMPACT
        // (physical resolve — never the quantizer-retraining rebuild);
        // (4) the resolve is invisible to queries (row-identical answers)
        // and clears the table, so (5) the next maintain is a no-op.
        // Dedicated (non-fixture) dir — deletion mutates.
        val emb = Tables.embeddings(s, d)
        val dir = java.nio.file.Files
          .createTempDirectory("graft_t134").toString + "/idx"
        Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8, dir)
        val n = emb.count()
        // 18 takedown batches (strictly past the 16-file fold budget),
        // residue classes 0..17 mod 90 = 20% of the corpus
        (0 until 18).foreach { r =>
          Similarity.ivfDelete(s, dir,
            emb.where($"vec_id" % 90 === r).select($"vec_id"), "vec_id")
        }
        val delIds = emb.where($"vec_id" % 90 < 18)
          .select($"vec_id").localCheckpoint()
        val nDel = delIds.count()
        val tsFiles = s.read.parquet(s"$dir/tombstones").inputFiles.length

        val queryRows = emb.orderBy($"vec_id").limit(4)
        def answers() = Similarity.ivfQuery(s, dir, queryRows,
          "vec_id", "embedding", k = 5, nProbe = 8).localCheckpoint()
        val pre = answers()
        val surfaced = pre
          .join(delIds.select($"vec_id".as("neighbor_id")),
            Seq("neighbor_id"), "left_semi")
          .select($"query_id".as("id_a"), $"neighbor_id".as("id_b"),
            lit("deleted_surfaced").as("reason"))

        val policy = AnnMaintenance.MaintenancePolicy(maxDriftRatio = 1e9,
          sustainAppends = 1, maxMixtureTv = None,
          maxTombstoneFraction = Some(0.1))
        val fired = AnnMaintenance.maintain(s, dir, policy)
        val post = answers()
        val second = AnnMaintenance.maintain(s, dir, policy)
        val live = s.read.parquet(s"$dir/cells").count()

        def flag(bad: Boolean, a: Long, b: Long, why: String) =
          if (!bad) s.emptyDataset[(Long, Long, String)]
            .toDF("id_a", "id_b", "reason")
          else Seq((a, b, why)).toDF("id_a", "id_b", "reason")
        val violations = Seq(
          flag(tsFiles > 17, tsFiles.toLong, 17L, "tombstone_files_unbounded"),
          flag(!fired.compacted || fired.rebuilt,
            if (fired.compacted) 1L else 0L, if (fired.rebuilt) 1L else 0L,
            "pressure_did_not_compact"),
          flag(IndexFs.exists(s"$dir/tombstones"), -2L, -2L,
            "tombstones_not_cleared"),
          flag(live != n - nDel, live, n - nDel, "live_rows_mismatch"),
          flag(second.compacted || second.rebuilt, -4L, -4L,
            "second_maintain_not_noop"))
        val answersChanged = pre.exceptAll(post).unionAll(post.exceptAll(pre))
          .select($"query_id".as("id_a"), $"neighbor_id".as("id_b"),
            lit("answers_changed").as("reason"))
        val sentinel = Seq((-1L, -1L, "sentinel")).toDF("id_a", "id_b", "reason")
        violations.reduce(_ unionAll _)
          .unionAll(surfaced).unionAll(answersChanged).unionAll(sentinel)
          .orderBy($"id_a", $"id_b", $"reason")
      },
      Some(AnnGates.oracle),
      doc = "Tombstone-pressure policy gate (AnnMaintenance.maintain's " +
        "third sensor + the appendTombstones file fold): 18 takedown " +
        "batches leave a bounded tombstone file count, deleted ids never " +
        "surface pre-resolve, pressure past maxTombstoneFraction fires a " +
        "COMPACT (physical resolve, no retrain) whose answers are " +
        "row-identical, the table clears, and the next maintain is a " +
        "no-op; violations + sentinel, constant oracle.",
      gate = true
    )
  )
}
