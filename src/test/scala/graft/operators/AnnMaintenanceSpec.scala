package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables.embeddings(spark, sf0001)

  // a distribution the build-time quantizer has NEVER seen: every
  // coordinate shifted by 0.7 (||shift||^2 = 64 * 0.49 vs unit-scale cell
  // radii), with fresh ids per batch
  private def shifted(tag: Long) = emb.where($"vec_id" % 2 =!= 0)
    .select(($"vec_id" + tag).as("vec_id"),
      transform($"embedding", x => (x + lit(0.7f)).cast("float")).as("embedding"))

  test("maintain: in-distribution appends never fire; sustained drift rebuilds exactly once and resets the ledger") {
    val dir = java.nio.file.Files.createTempDirectory("ann_maint").toString
    val half = emb.where($"vec_id" % 2 === 0)
    Similarity.ivfBuild(half, "vec_id", "embedding", 4, dir)
    val policy = AnnMaintenance.MaintenancePolicy(
      maxDriftRatio = 2.0, sustainAppends = 2)

    // in-distribution growth: the ledger fills but the policy stays quiet
    val rest = emb.where($"vec_id" % 2 =!= 0)
    AnnMaintenance.append(spark, dir,
      rest.where($"vec_id" % 4 === 1), "vec_id", "embedding")
    val d0 = AnnMaintenance.maintain(spark, dir, policy)
    assert(!d0.rebuilt && d0.appendsLogged == 1, d0.toString)
    AnnMaintenance.append(spark, dir,
      rest.where($"vec_id" % 4 === 3), "vec_id", "embedding")
    val d1 = AnnMaintenance.maintain(spark, dir, policy)
    assert(!d1.rebuilt && !d1.sustainedDrift && d1.appendsLogged == 2,
      d1.toString)

    // one hot batch is NOT a trend
    AnnMaintenance.append(spark, dir, shifted(10000), "vec_id", "embedding")
    val hot1 = AnnMaintenance.maintain(spark, dir, policy)
    assert(!hot1.rebuilt && !hot1.sustainedDrift, hot1.toString)

    // the second consecutive hot batch sustains the trend -> rebuild fires
    AnnMaintenance.append(spark, dir, shifted(20000), "vec_id", "embedding")
    val fire = AnnMaintenance.maintain(spark, dir, policy)
    assert(fire.rebuilt && fire.sustainedDrift, fire.toString)
    assert(fire.recentRatios.size == 2 && fire.recentRatios.forall(_ > 2.0),
      fire.toString)
    // swap hygiene: no staging or .old leftovers, all vectors present
    assert(!new java.io.File(s"$dir.rebuild").exists())
    assert(!new java.io.File(s"$dir.old").exists())
    assert(spark.read.parquet(s"$dir/cells").count() == emb.count() * 2)

    // the whole-dir swap reset the drift ledger with the stats baseline:
    // an immediate second maintain is a no-op, not a second rebuild
    val after = AnnMaintenance.maintain(spark, dir, policy)
    assert(!after.rebuilt && after.appendsLogged == 0, after.toString)

    // and the once-foreign distribution now reads in-distribution (the
    // rebuilt quantizer has seen it) — the loop CONVERGES, not oscillates
    AnnMaintenance.append(spark, dir, shifted(30000), "vec_id", "embedding")
    AnnMaintenance.append(spark, dir, shifted(40000), "vec_id", "embedding")
    val settled = AnnMaintenance.maintain(spark, dir, policy)
    assert(!settled.rebuilt && !settled.sustainedDrift, settled.toString)
  }

  test("mixture sensor: concentration drift the distance ratio saturates on still fires the rebuild") {
    // THE CLI-DISCOVERED BLIND SPOT, as a spec: on the unit-space residual
    // layout a constant coordinate shift barely moves the assignment
    // distances (everything on the sphere is within 2 of everything), so
    // the spread ratio reads ~1 — but the shifted batch concentrates into
    // the diagonal-facing cells, and the mixture total-variation sees it.
    val dir = java.nio.file.Files.createTempDirectory("ann_maint_mix").toString
    ProductQuantizer.ivfPqBuildResidual(emb, "vec_id", "embedding", 8, 8, 8, dir)
    val policy = AnnMaintenance.MaintenancePolicy(
      maxDriftRatio = 1.5, sustainAppends = 2, maxMixtureTv = Some(0.5))
    val s1 = AnnMaintenance.append(spark, dir, shifted(50000), "vec_id", "embedding")
    val s2 = AnnMaintenance.append(spark, dir, shifted(60000), "vec_id", "embedding")
    // the spread sensor is BLIND to this drift...
    assert(s1.driftRatio.exists(_ < 1.5) && s2.driftRatio.exists(_ < 1.5),
      s"expected saturated ratios: $s1 / $s2")
    // ...the mixture sensor is not
    assert(s1.mixtureTv.exists(_ > 0.5) && s2.mixtureTv.exists(_ > 0.5),
      s"expected concentration to read: $s1 / $s2")
    val fire = AnnMaintenance.maintain(spark, dir, policy)
    assert(fire.rebuilt && fire.sustainedMixture && !fire.sustainedDrift,
      fire.toString)
    assert(fire.reason.contains("mixture"), fire.reason)
    // and with the mixture sensor disabled, the policy stays (wrongly)
    // quiet — pinning that the rebuild above really came from it
    val dir2 = java.nio.file.Files.createTempDirectory("ann_maint_mix2").toString
    ProductQuantizer.ivfPqBuildResidual(emb, "vec_id", "embedding", 8, 8, 8, dir2)
    AnnMaintenance.append(spark, dir2, shifted(70000), "vec_id", "embedding")
    AnnMaintenance.append(spark, dir2, shifted(80000), "vec_id", "embedding")
    val blind = AnnMaintenance.maintain(spark, dir2, policy.copy(maxMixtureTv = None))
    assert(!blind.rebuilt, blind.toString)
  }

  test("maintain: the recall floor drives the composed rebuild; the residual encoding survives the swap") {
    val dir = java.nio.file.Files.createTempDirectory("ann_maint_pq").toString
    ProductQuantizer.ivfPqBuildResidual(emb.where($"vec_id" % 2 === 0),
      "vec_id", "embedding", 4, 8, 8, dir)
    AnnMaintenance.append(spark, dir,
      emb.where($"vec_id" % 2 =!= 0), "vec_id", "embedding")

    // floor 0: recall is MEASURED (the trace proves it) but never below
    val ok = AnnMaintenance.maintain(spark, dir,
      AnnMaintenance.MaintenancePolicy(recallFloor = Some(0.0)))
    assert(!ok.rebuilt && ok.measuredRecall.isDefined, ok.toString)

    // an unmeetable floor: the ground-truth branch fires even though the
    // drift ledger alone would not (one quiet append)
    val fire = AnnMaintenance.maintain(spark, dir,
      AnnMaintenance.MaintenancePolicy(recallFloor = Some(1.01)))
    assert(fire.rebuilt && !fire.sustainedDrift &&
      fire.measuredRecall.isDefined, fire.toString)
    // layout dispatch went through ivfPqRebuild and KEPT the encoding
    assert(ProductQuantizer.loadModel(spark,
      IncrementalDedup.readRoot(dir)).encoding == "residual")
    assert(spark.read.parquet(
      s"${IncrementalDedup.readRoot(dir)}/cells").count() == emb.count())
    assert(ProductQuantizer.ivfPqQuery(spark, dir, emb.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 5, nProbe = 4, rerank = 100).count() > 0)
  }

  test("drift ledger hygiene: maintain folds a fragmented log to one file with the tail " +
      "unchanged; ivfCompact carries the ledger; seqs stay strictly increasing") {
    val dir = java.nio.file.Files.createTempDirectory("ann_ledger").toString
    Similarity.ivfBuild(emb, "vec_id", "embedding", 4, dir)
    // 18 one-row appends = 18 ledger files (one coalesced row each) — the
    // daemon-per-snapshot accumulation shape, past the 16-file budget
    (1 to 18).foreach { i =>
      AnnMaintenance.append(spark, dir,
        emb.limit(1).select(($"vec_id" + 100000L * i).as("vec_id"),
          $"embedding"), "vec_id", "embedding")
    }
    val logDir = s"$dir/drift_log"
    assert(spark.read.parquet(logDir).inputFiles.length > 16)
    val tailBefore = spark.read.parquet(logDir)
      .orderBy($"seq".desc).limit(3).collect().toSeq

    val d = AnnMaintenance.maintain(spark, dir,
      AnnMaintenance.MaintenancePolicy(maxDriftRatio = 1e9,
        maxMixtureTv = None))
    assert(!d.rebuilt && d.appendsLogged == 18, d.toString)
    // folded: one file, all 18 rows, identical recency tail
    assert(spark.read.parquet(logDir).inputFiles.length == 1)
    assert(spark.read.parquet(logDir).count() == 18)
    assert(spark.read.parquet(logDir).orderBy($"seq".desc).limit(3)
      .collect().toSeq == tailBefore)

    // compaction carries the ledger (it used to be silently destroyed) —
    // into the NEW generation, so the path re-resolves
    Similarity.ivfCompact(spark, dir)
    val logDir2 = s"${IncrementalDedup.readRoot(dir)}/drift_log"
    assert(spark.read.parquet(logDir2).count() == 18)
    assert(spark.read.parquet(logDir2).inputFiles.length == 1)

    // the next append takes max(seq)+1 over the folded log — seqs stay
    // strictly increasing and duplicate-free across fold + compaction
    AnnMaintenance.append(spark, dir,
      emb.limit(1).select(($"vec_id" + 9900000L).as("vec_id"), $"embedding"),
      "vec_id", "embedding")
    val seqs = spark.read.parquet(logDir2).select($"seq").as[Long]
      .collect().sorted.toSeq
    assert(seqs == (0L to 18L), seqs.toString)
  }

  test("tombstone pressure: delete batches stay file-bounded; maintain compacts " +
      "exactly once (physical resolve, no retrain), then the next maintain is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("ann_ts").toString
    Similarity.ivfBuild(emb, "vec_id", "embedding", 4, dir)
    val policy = AnnMaintenance.MaintenancePolicy(maxDriftRatio = 1e9,
      sustainAppends = 1, maxMixtureTv = None,
      maxTombstoneFraction = Some(0.25))

    // tombstone-free index: the sensor reads nothing and stays quiet
    val quiet = AnnMaintenance.maintain(spark, dir, policy)
    assert(!quiet.compacted && !quiet.rebuilt &&
      quiet.tombstoneFraction.isEmpty, quiet.toString)

    // 20 takedown batches of 8 ids = 160/500 = 0.32 tombstoned. Without
    // the appendTombstones fold this is 20 parquet files that EVERY
    // query's anti-join re-lists forever (the drift_log failure shape)
    for (b <- 0 until 20) {
      val ids = spark.range(b * 8L, b * 8L + 8L).select($"id".as("vec_id"))
      Similarity.ivfDelete(spark, dir, ids, "vec_id")
    }
    val ts = spark.read.parquet(s"$dir/tombstones")
    assert(ts.inputFiles.length <= 17,
      s"tombstone table fragmented: ${ts.inputFiles.length} files after 20 batches")
    assert(ts.count() == 160)

    // deletions already hide at read time (pre-compact), and the query
    // answers must be ROW-IDENTICAL across the physical resolve
    val queries = emb.where($"vec_id" >= 200 && $"vec_id" < 203)
    def answers() = Similarity.ivfQuery(spark, dir, queries,
        "vec_id", "embedding", k = 5, nProbe = 4)
      .select($"query_id", $"neighbor_id", $"rank").collect().toSet
    val pre = answers()
    assert(!pre.exists(_.getLong(1) < 160), "deleted id surfaced pre-compact")

    val d = AnnMaintenance.maintain(spark, dir, policy)
    assert(d.compacted && !d.rebuilt, d.toString)
    assert(d.tombstoneFraction.exists(_ > 0.25), d.toString)
    assert(!IndexFs.exists(s"${IncrementalDedup.readRoot(dir)}/tombstones"),
      "compact must physically resolve and clear the tombstone table")
    assert(spark.read.parquet(
      s"${IncrementalDedup.readRoot(dir)}/cells").count() == 340)
    assert(answers() == pre, "compaction changed query answers")

    // pressure relieved: the next maintain sees no tombstone table at all
    val again = AnnMaintenance.maintain(spark, dir, policy)
    assert(!again.compacted && !again.rebuilt &&
      again.tombstoneFraction.isEmpty, again.toString)
  }

  test("upsert pressure: the delta-fraction sensor compacts (physical fold), then the next maintain is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("ann_upfrac").toString
    Similarity.ivfBuild(emb, "vec_id", "embedding", 4, dir)
    val policy = AnnMaintenance.MaintenancePolicy(maxDriftRatio = 1e9,
      sustainAppends = 1, maxMixtureTv = None,
      maxTombstoneFraction = None, maxUpsertFraction = Some(0.2))
    // below pressure: ~10% of ids re-embedded — sensor reads but stays quiet
    Similarity.ivfUpsert(spark, dir,
      emb.where($"vec_id" % 10 === 0)
        .select($"vec_id", transform($"embedding",
          x => (x * 0.5f).cast("float")).as("embedding")),
      "vec_id", "embedding")
    val quiet = AnnMaintenance.maintain(spark, dir, policy)
    assert(!quiet.compacted && !quiet.rebuilt, quiet.toString)
    assert(quiet.upsertFraction.exists(f => f > 0 && f <= 0.2), quiet.toString)
    // past pressure: another ~20% of ids re-embedded
    Similarity.ivfUpsert(spark, dir,
      emb.where($"vec_id" % 10 === 1 || $"vec_id" % 10 === 2)
        .select($"vec_id", transform($"embedding",
          x => (x * 0.25f).cast("float")).as("embedding")),
      "vec_id", "embedding")
    val queries = emb.where($"vec_id" >= 200 && $"vec_id" < 203)
    def answers() = Similarity.ivfQuery(spark, dir, queries,
        "vec_id", "embedding", k = 5, nProbe = 4)
      .select($"query_id", $"neighbor_id", $"rank").collect().toSet
    val pre = answers()
    val d = AnnMaintenance.maintain(spark, dir, policy)
    assert(d.compacted && !d.rebuilt, d.toString)
    assert(d.upsertFraction.exists(_ > 0.2), d.toString)
    val root = IncrementalDedup.readRoot(dir)
    assert(!IndexFs.exists(s"$root/upserts"),
      "compact must fold the upsert delta physically")
    assert(answers() == pre, "the physical fold changed query answers")
    val again = AnnMaintenance.maintain(spark, dir, policy)
    assert(!again.compacted && again.upsertFraction.isEmpty, again.toString)
  }
}
