package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-16 deployment fix: the WHOLE index lifecycle resolves its
  * filesystem through the Hadoop API ([[IndexFs]]), so an index dir named
  * by a URI (HDFS/S3/`file:`) behaves exactly like a local path. Every
  * test here drives the lifecycle through `file:`-scheme URIs — which
  * `java.nio.file.Paths.get` CANNOT resolve (it would treat `file:/x` as
  * a relative path named "file:"), so a green run proves no local-only
  * call sits on the path.
  */
class IndexFsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpUri(tag: String): String =
    "file:" + java.nio.file.Files.createTempDirectory(tag).toString

  test("full composed-ANN lifecycle through a file:-scheme URI: " +
      "build → append (composed dispatch) → maintain → rebuild → compact → query → recall") {
    val dir = s"${tmpUri("idx_fs")}/idx"
    val emb = graft.core.Tables.embeddings(spark, sf0001)
    val half = emb.where($"vec_id" % 2 === 0)
    ProductQuantizer.ivfPqBuildResidual(half, "vec_id", "embedding",
      nCells = 4, m = 8, nCodes = 8, dir)
    // the layout marker is visible through the URI — the exact probe that
    // silently read false under java.nio and mis-dispatched appends
    assert(AnnMaintenance.isComposed(dir), s"pq_model probe failed at $dir")

    // append MUST take the composed arc: every appended row carries codes
    val st = AnnMaintenance.append(spark, dir,
      emb.where($"vec_id" % 2 =!= 0), "vec_id", "embedding")
    assert(st.n == emb.count() - half.count())
    // the stats probe resolved through the URI too (drift baseline found)
    assert(st.driftRatio.isDefined && st.mixtureTv.isDefined, st.toString)
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() == emb.count())
    assert(cells.where(col("codes").isNull).count() == 0,
      "append wrote rows without codes — the plain-IVF mis-dispatch")
    assert(spark.read.parquet(s"$dir/drift_log").count() == 1)

    // maintain reads the ledger through the URI and leaves a quiet index be
    val quiet = AnnMaintenance.maintain(spark, dir,
      AnnMaintenance.MaintenancePolicy(maxDriftRatio = 1e9,
        sustainAppends = 1, maxMixtureTv = None))
    assert(!quiet.rebuilt && quiet.appendsLogged == 1, quiet.toString)

    // rebuild + compact: staging, swap, and side-table carries via Hadoop
    assert(ProductQuantizer.ivfPqRebuild(spark, dir, nCells = 4) == emb.count())
    assert(!IndexFs.exists(s"$dir.rebuild") && !IndexFs.exists(s"$dir.old"))
    assert(Similarity.ivfCompact(spark, dir) == emb.count())
    assert(!IndexFs.exists(s"$dir.compact") && !IndexFs.exists(s"$dir.old"))
    assert(AnnMaintenance.isComposed(dir), "compact dropped pq_model")

    // the composed query path and the recall harness dispatch through the URI
    val queries = emb.orderBy($"vec_id").limit(3)
    val out = ProductQuantizer.ivfPqQuery(spark, dir, queries,
      "vec_id", "embedding", k = 3, nProbe = 4, rerank = 10)
    assert(out.count() == 9)
    val r = Similarity.indexRecall(spark, dir, k = 3, nProbe = 4, nQueries = 4)
    assert(r >= 0.0 && r <= 1.0)
  }

  test("swap + crash-window recovery + staging clear through file: URIs") {
    val live = s"${tmpUri("idx_fs_swap")}/live"
    Seq(1).toDF("v").write.parquet(live)
    Seq(2).toDF("v").write.parquet(s"$live.next")
    IncrementalDedup.replaceDir(live, s"$live.next")
    assert(spark.read.parquet(live).as[Int].head() == 2)
    assert(!IndexFs.exists(s"$live.old") && !IndexFs.exists(s"$live.next"))

    // crash between the two renames: no live dir, a complete .old → roll back
    IndexFs.rename(live, s"$live.old")
    IncrementalDedup.recoverDir(live)
    assert(spark.read.parquet(live).as[Int].head() == 2)
    assert(!IndexFs.exists(s"$live.old"))

    // stale .old beside an intact live (crash after rename 2): removed
    Seq(3).toDF("v").write.parquet(s"$live.old")
    IncrementalDedup.recoverDir(live)
    assert(!IndexFs.exists(s"$live.old"))
    assert(spark.read.parquet(live).as[Int].head() == 2)

    Seq(4).toDF("v").write.parquet(s"$live.next")
    IncrementalDedup.clearStaging(s"$live.next")
    assert(!IndexFs.exists(s"$live.next"))
  }

  test("delta-index compaction lists and moves batch= dirs through the Hadoop API") {
    val ix = s"${tmpUri("idx_fs_delta")}/fp"
    Seq("a", "b").toDF("fp").write.parquet(s"$ix/batch=1")
    Seq("b", "c").toDF("fp").write.parquet(s"$ix/batch=2")
    assert(IncrementalDedup.compactFpIndex(spark, ix) == 3)
    // the compact committed a new GENERATION — the folded layout lives
    // under the resolved root (the raw root keeps the grace-retained
    // previous generation until the next commit)
    assert(IndexFs.subdirNames(IncrementalDedup.readRoot(ix))
      .filter(_.startsWith("batch=")).toSet == Set("batch=-1"))
    assert(spark.read.parquet(IncrementalDedup.readRoot(ix))
      .select($"fp").as[String].collect().toSet == Set("a", "b", "c"))

    // a preserved delta survives AS a delta (moved, not folded) — new
    // deltas land in the live generation, like every delta writer does
    Seq("c", "d").toDF("fp").write
      .parquet(s"${IncrementalDedup.readRoot(ix)}/batch=7")
    IncrementalDedup.compactFpIndex(spark, ix, preserveBatchIds = Set(7L))
    assert(IndexFs.subdirNames(IncrementalDedup.readRoot(ix))
      .filter(_.startsWith("batch=")).toSet == Set("batch=-1", "batch=7"))
    assert(spark.read.parquet(IncrementalDedup.readRoot(ix))
      .select($"fp").distinct().count() == 4)
  }

  test("CLI admit is URI-faithful: the second run rejects the duplicate batch " +
      "instead of wiping the accumulated index (exact AND near mode)") {
    // the round-16 regression shape: `admit` probed its index dir with
    // java.io.File, which reads false for any URI — so the second run
    // rebuilt an EMPTY index from batch.limit(0), admitted the whole
    // batch again, and the (now Hadoop-correct) swap REPLACED the real
    // index with the batch-only one. Driving the command twice through a
    // file:-scheme URI pins the fix: run 2 must admit zero rows.
    val base = tmpUri("cli_admit")
    val in = s"$base/batch"
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "an entirely different document about spark planning"),
        (3L, "a third unrelated page with its own words"))
      .toDF("id", "text").write.parquet(in)

    graft.cli.GraftCli.run(spark,
      List("admit", in, s"$base/fpix", s"$base/out1", "id", "text"))
    assert(spark.read.parquet(s"$base/out1").count() == 3)
    assert(spark.read.parquet(
      IncrementalDedup.readRoot(s"$base/fpix")).count() == 3)
    graft.cli.GraftCli.run(spark,
      List("admit", in, s"$base/fpix", s"$base/out2", "id", "text"))
    assert(spark.read.parquet(s"$base/out2").count() == 0,
      "second run re-admitted a fully duplicate batch — the index probe is not URI-faithful")
    assert(spark.read.parquet(
      IncrementalDedup.readRoot(s"$base/fpix")).count() == 3,
      "second run destroyed the accumulated index")

    graft.cli.GraftCli.run(spark,
      List("admit", in, s"$base/sigix", s"$base/nout1", "id", "text", "near"))
    assert(spark.read.parquet(s"$base/nout1").count() == 3)
    graft.cli.GraftCli.run(spark,
      List("admit", in, s"$base/sigix", s"$base/nout2", "id", "text", "near"))
    assert(spark.read.parquet(s"$base/nout2").count() == 0,
      "near-mode second run re-admitted duplicates through the URI")
    // no lease marker left behind by either mode
    assert(!IndexFs.exists(IndexLease.leasePath(s"$base/fpix")))
    assert(!IndexFs.exists(IndexLease.leasePath(s"$base/sigix")))
  }

  test("grep gate: zero local-filesystem calls in the index/release lifecycle sources") {
    // the fix is only durable if java.nio/java.io never creeps back into
    // these files: any probe/rename/walk they perform must resolve the
    // filesystem from the PATH (Hadoop API), or HDFS/S3 index URIs break
    val lifecycle = Seq(
      "src/main/scala/graft/operators/IndexFs.scala",
      "src/main/scala/graft/operators/IndexLease.scala",
      "src/main/scala/graft/operators/IncrementalDedup.scala",
      "src/main/scala/graft/operators/Similarity.scala",
      "src/main/scala/graft/operators/ProductQuantizer.scala",
      "src/main/scala/graft/operators/AnnMaintenance.scala",
      "src/main/scala/graft/operators/TrainingOrder.scala",
      "src/main/scala/graft/operators/Bpe.scala",
      "src/main/scala/graft/operators/LexIndex.scala",
      "src/main/scala/graft/sinks/DatasetManifest.scala",
      "src/main/scala/graft/pipeline/CrawlPipeline.scala",
      "src/main/scala/graft/streaming/StreamingOps.scala",
      // the CLI touches index dirs too (admit's probe WAS this bug family:
      // a java.io.File exists() on an HDFS URI reads false, rebuilds an
      // empty index, and the now-working Hadoop swap replaces the real one)
      "src/main/scala/graft/cli/GraftCli.scala")
    for (f <- lifecycle) {
      val p = java.nio.file.Paths.get(f)
      assert(java.nio.file.Files.exists(p), s"gate input missing: $f")
      val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      for (banned <- Seq("java.nio.file.Files", "java.io.File("))
        assert(!src.contains(banned),
          s"$f contains '$banned' — route it through IndexFs (Hadoop FS)")
    }
  }

  test("CLI admit heals a crashed swap before probing: an .old-only index is recovered, never destroyed") {
    // the crash-window twin of the URI-probe regression: a prior admit
    // dying between replaceDir's two renames leaves ONLY `fpix.old` on
    // disk. Without recoverDir-before-probe, the retry reads
    // indexExists=false, rebuilds from batch.limit(0), and its own swap's
    // deleteRecursive(.old) permanently destroys the accumulated index.
    val base = tmpUri("cli_admit_crash")
    val in = s"$base/batch"
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "an entirely different document about spark planning"),
        (3L, "a third unrelated page with its own words"))
      .toDF("id", "text").write.parquet(in)
    graft.cli.GraftCli.run(spark,
      List("admit", in, s"$base/fpix", s"$base/out1", "id", "text"))
    assert(spark.read.parquet(s"$base/fpix").count() == 3)
    // simulate the crash: live dir renamed aside, `.next` never moved in
    IndexFs.rename(s"$base/fpix", s"$base/fpix.old")
    graft.cli.GraftCli.run(spark,
      List("admit", in, s"$base/fpix", s"$base/out2", "id", "text"))
    assert(spark.read.parquet(s"$base/out2").count() == 0,
      "retry after a crashed swap re-admitted a fully duplicate batch — " +
        "the accumulated index was not recovered before the exists probe")
    assert(spark.read.parquet(s"$base/fpix").count() == 3,
      "retry after a crashed swap destroyed the accumulated index")
    assert(!IndexFs.exists(s"$base/fpix.old"), "stale .old left behind")
  }

  test("run() throws on an unknown command instead of killing the host JVM") {
    // run() is a public spec/daemon surface; a malformed arg list must
    // surface as an exception the host can catch — sys.exit lives only in
    // main(), the CLI process's exit authority
    val e = intercept[IllegalArgumentException] {
      graft.cli.GraftCli.run(spark, List("definitely-not-a-command"))
    }
    assert(e.getMessage.contains("unknown command"), e.getMessage)
    assert(e.getMessage.contains("usage:"), e.getMessage)
  }
}
