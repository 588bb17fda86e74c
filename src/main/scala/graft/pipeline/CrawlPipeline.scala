package graft.pipeline

import graft.enrich.{EnrichConfig, EnrichOperator, LlmTransport}
import graft.operators.{IncrementalDedup, ParagraphDedup, QualityRules, Robots, Splits, TextAnalysis, TextPipeline, WebOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructType}

/** The staged crawl-curation composition — the engine's analog of the
  * reference orchestrator's sequenced 1→2→3 pipeline run
  * (`setup_project.py:978-1031`: run each stage, checkpoint to the
  * filesystem, later stages consume earlier stages' artifacts):
  *
  *   WARC → HTTP body text → robots admission → canonical-URL dedup →
  *   content extraction (line density, paragraph-preserving) →
  *   Gopher quality rules → cross-doc paragraph dedup → leakage-safe
  *   splits → sequence packing
  *
  * Every stage writes a parquet checkpoint under `workDir` and the next
  * stage reads it back, so any stage can be re-run or inspected in
  * isolation and a failure loses only one stage of work — the property
  * that matters when stage 1 is a 100 TB WARC scan. Each stage is one of
  * the engine's oracle-gated operators; this object adds only sequencing.
  *
  * The robots rule table is taken from the SAME crawl (responses whose URL
  * path is exactly /robots.txt), which is how a real crawler materializes
  * admission policy: fetch policy artifacts first, then gate content by
  * them. Hosts without a robots.txt admit everything (RFC 9309 default).
  */
object CrawlPipeline {

  final case class StageCount(stage: String, rows: Long)

  /** Optional `10_enrich` stage config: the distributed LLM-map operator
    * (E1–E7) runs over the curated corpus with this transport + prompt —
    * the reference's Program 1→2→3 chain (`setup_project.py:978-1031`)
    * as one sequenced command. The transport is a FACTORY because it is
    * instantiated per partition on executors (pooled-session analog).
    */
  final case class EnrichStage(transportFactory: () => LlmTransport,
      promptTemplate: String, config: EnrichConfig = EnrichConfig())

  def run(spark: SparkSession, warcGlob: String, workDir: String,
      agent: String = "graftbot", capacity: Long = 2048L,
      maxPayloadBytes: Int = 8 * 1024 * 1024,
      indexDir: Option[String] = None,
      enrichStage: Option[EnrichStage] = None,
      // per-stage row accounting is one extra pass per stage (cheap here,
      // real money on a 100 TB WARC scan) — turn it off and the returned
      // Seq names each stage with rows = -1, checkpoints unaffected
      countStages: Boolean = true,
      // set by [[runStream]]'s foreachBatch: switches the admission indexes
      // from swap-on-update to the replay-idempotent `batch=<id>` DELTA
      // layout ([[graft.streaming.StreamingOps.admitNearDupStream]]'s
      // discipline — own delta excluded on read, overwritten on write)
      snapshotId: Option[Long] = None,
      // Gopher rule thresholds for the 06_quality stage — the published
      // English-centric defaults are a starting point every real corpus
      // tunes (e.g. relax minStopHits for non-English or synthetic slices)
      qualityThresholds: QualityRules.Thresholds = QualityRules.Thresholds()): Seq[StageCount] = {
    val counts = scala.collection.mutable.ArrayBuffer.empty[StageCount]
    def ck(stage: String, df: DataFrame, parts: Seq[String] = Nil): DataFrame = {
      val w = df.write.mode("overwrite")
      (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
        .parquet(s"$workDir/$stage")
      // explicit schema: a stage that filtered everything away writes no
      // part files (AQE collapses empty plans to zero partitions) and
      // schema inference would fail — an empty crawl slice must flow
      // through as zero rows, not kill the run
      val back = spark.read.schema(df.schema).parquet(s"$workDir/$stage")
      counts += StageCount(stage, if (countStages) back.count() else -1L)
      back
    }

    val warc = ck("01_warc",
      graft.sources.WarcSource.readWarc(spark, warcGlob, maxPayloadBytes))
    val pages = ck("02_pages", warc
      .where(col("warc_type") === "response" && !col("truncated"))
      .select(col("target_uri").as("url"),
        WebOps.httpBodyText(col("payload")).as("text"))
      .where(length(col("text")) > 0))

    // robots admission: policy bodies come from the crawl itself — and,
    // when a cross-snapshot index dir is given, from every PREVIOUS crawl
    // too: a snapshot that does not refetch a host's robots.txt must still
    // honor the host's standing policy (real crawlers cache robots far
    // longer than one fetch round). The current crawl's fetch wins per host
    // (that IS the policy refresh); persisted bodies fill in the rest.
    val isRobotsUrl = col("url").rlike("^[A-Za-z][A-Za-z0-9+.-]*://[^/]*/robots\\.txt$")
    val crawlBodies = pages.where(isRobotsUrl)
      .select(WebOps.host(col("url")).as("host"), col("text"))
    val policyBodies = indexDir match {
      case None => crawlBodies
      case Some(ix) =>
        val rDir = s"$ix/robots"
        val rSchema = new StructType().add("host", StringType).add("text", StringType)
        def rEmpty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rSchema)
        val prev0 =
          if (!new java.io.File(rDir).exists()) rEmpty
          else
            try spark.read.parquet(rDir)
            catch {
              // robots-less snapshots write zero-row deltas: no footers to
              // infer from is an empty policy table, not corruption
              case ae: org.apache.spark.sql.AnalysisException
                  if ae.getCondition == "UNABLE_TO_INFER_SCHEMA" => rEmpty
            }
        // delta mode: drop this batch's own delta (replay guard), then the
        // LATEST persisted body per host stands; the swap layout is already
        // one row per host
        val prev1 = snapshotId match {
          case Some(bid) if prev0.columns.contains("batch") =>
            prev0.where(col("batch") =!= bid)
          case _ => prev0
        }
        val prev =
          if (prev1.columns.contains("batch"))
            prev1.groupBy(col("host")).agg(max_by(col("text"), col("batch")).as("text"))
          else prev1.select(col("host"), col("text"))
        // one deterministic body per host within the crawl (a WARC can carry
        // the same robots URL twice)
        val crawlDedup = crawlBodies.groupBy(col("host")).agg(min(col("text")).as("text"))
        val merged = crawlDedup.unionByName(
          prev.join(crawlDedup.select(col("host")), Seq("host"), "left_anti"))
        snapshotId match {
          case Some(bid) =>
            // replay-idempotent delta: persist ONLY this crawl's fetches;
            // history selection happens at read time (latest batch wins)
            crawlDedup.write.mode("overwrite").parquet(s"$rDir/batch=$bid")
            merged
          case None =>
            merged.write.parquet(s"$rDir.next")
            IncrementalDedup.replaceDir(rDir, s"$rDir.next")
            // read-back: merged's lineage points at the dir the swap just
            // replaced; downstream stages must read the new live copy
            spark.read.schema(rSchema).parquet(rDir)
        }
    }
    val ruleTable = Robots.parseRules(
        policyBodies.select(col("host").as("rid"), col("text")),
        col("rid"), col("text"))
      .withColumnRenamed("id", "host")
    val admitted = ck("03_admitted",
      Robots.isAllowed(pages.where(!isRobotsUrl), col("url"), agent, ruleTable)
        .where(col("allowed")).drop("allowed", "__host", "__path"))

    // canonical-URL dedup: deterministic id from the url byte string
    val deduped = ck("04_url_dedup",
      WebOps.dedupByCanonicalUrl(
          admitted.withColumn("doc_id", xxhash64(col("url"))),
          col("url"), col("doc_id"))
        .where(col("url_survivor")).drop("url_survivor", "canonical_url"))

    // cross-SNAPSHOT admission (optional): dedup this crawl against the
    // persisted fingerprint + MinHash-signature indexes of everything
    // already admitted by PREVIOUS runs, then fold the survivors back into
    // both indexes — the reference's skip-already-processed incrementality
    // (`src/program2_ai_processor.py:692-724`) lifted from file names to
    // content granularity at corpus scale. Without this, a second crawl of
    // the same sites re-admits everything downstream. Exact admission is a
    // LEFT ANTI join on 16-byte hashes; near-dup admission is LSH-banded
    // against signatures only (history work is O(batch collisions), never
    // O(corpus)). Index updates go through write-then-swap ([[IncrementalDedup.replaceDir]]):
    // a killed run never truncates the live index.
    val fresh = indexDir match {
      case None => deduped
      case Some(ix) =>
        val fpDir = s"$ix/fp"
        val sigDir = s"$ix/sig"
        // In delta mode (snapshotId set) the batch's OWN `batch=<id>` delta
        // is excluded on read: a replayed micro-batch would otherwise
        // self-match every previously admitted page against its persisted
        // fingerprint/signature, reject the whole batch, and overwrite the
        // admitted output and deltas with empty frames — permanent loss.
        def readOrEmpty(dir: String, schema: StructType): DataFrame = {
          def empty = spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          val base =
            if (!new java.io.File(dir).exists()) empty
            else
              try spark.read.parquet(dir)
              catch {
                // a dir whose deltas hold zero rows has no parquet footers
                // to infer from (a snapshot that admitted NOTHING still
                // writes its batch=<id> delta) — that is an empty index,
                // not corruption; every OTHER read failure still propagates
                case ae: org.apache.spark.sql.AnalysisException
                    if ae.getCondition == "UNABLE_TO_INFER_SCHEMA" => empty
              }
          snapshotId match {
            case Some(bid) if base.columns.contains("batch") =>
              base.where(col("batch") =!= bid).select(schema.fieldNames.map(col): _*)
            case _ => base.select(schema.fieldNames.map(col): _*)
          }
        }
        val fpIndex = readOrEmpty(fpDir,
          new StructType().add("fp", StringType))
        val sigIndex = readOrEmpty(sigDir, new StructType()
          .add("id", LongType).add("sig", ArrayType(LongType)))
        val exact = IncrementalDedup.admit(
          deduped, fpIndex, TextAnalysis.fingerprint(col("text")), col("doc_id"))
        // checkpointed (parquet write + read-back) BEFORE the index updates:
        // both updates consume the admitted rows, and their lineage reads
        // the LIVE index dirs, which the writes below modify
        val admitted = ck("04b_admit",
          IncrementalDedup.admitNearDup(exact, sigIndex, "doc_id", "text"))
        snapshotId match {
          case Some(bid) =>
            // replay-idempotent delta layout: overwrite THIS batch's deltas
            // only; history and concurrent batches are untouched, and a
            // replay rewrites the same files instead of duplicating them
            admitted.select(col("fp")).distinct()
              .write.mode("overwrite").parquet(s"$fpDir/batch=$bid")
            admitted.select(col("id"), col("sig"))
              .write.mode("overwrite").parquet(s"$sigDir/batch=$bid")
          case None =>
            // batch mode: full-index rewrite behind a write-then-swap so a
            // killed run never truncates the live index
            IncrementalDedup.updatedIndex(fpIndex, admitted)
              .write.parquet(s"$fpDir.next")
            IncrementalDedup.replaceDir(fpDir, s"$fpDir.next")
            IncrementalDedup.updatedSigIndex(sigIndex,
                admitted.select(col("id"), col("sig")))
              .write.parquet(s"$sigDir.next")
            IncrementalDedup.replaceDir(sigDir, s"$sigDir.next")
        }
        admitted.drop("id", "sig", "fp")
    }

    // within-page content extraction in keepBlank mode: nav/separator/
    // footer chrome dies on line shape alone, while blank-line paragraph
    // separators survive (collapsed to one) — the paragraph-level dedup
    // below splits on them, so the default mode would silently merge
    // adjacent paragraphs here. The 50% density floor counts UNICODE
    // letters/digits, so non-Latin pages (CJK/Cyrillic/Arabic prose has
    // ~0% ASCII alphanumerics) flow through intact rather than being
    // deleted wholesale
    val content = ck("05_content",
      TextPipeline.extractContent(fresh, col("doc_id"), col("text"),
          minLineChars = 30, minAlnumPct = 50, keepBlank = true)
        .join(fresh.select(col("doc_id").as("id"), col("url")), Seq("id"))
        .select(col("id").as("doc_id"), col("url"), col("content").as("text")))

    val quality = ck("06_quality",
      content.where(QualityRules.keep(col("text"), qualityThresholds)))

    // cross-doc paragraph dedup, then re-attach the url for downstream
    // split assignment (dedupParagraphs returns id/text_dedup/counters)
    val para = ck("07_para_dedup",
      ParagraphDedup.dedupParagraphs(quality, col("doc_id"), col("text"))
        .join(quality.select(col("doc_id").as("id"), col("url")), Seq("id"))
        .select(col("id").as("doc_id"), col("url"),
          col("text_dedup").as("text"), col("n_paras"), col("n_kept")))

    // leakage-safe splits: whole HOSTS land in one split, written
    // partitioned so readers partition-prune on split=
    val split = ck("08_splits", para
      .withColumn("host", WebOps.host(col("url")))
      .withColumn("split", Splits.assign(col("host"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))),
      parts = Seq("split"))

    ck("09_pack", TextPipeline.packSequences(
      split.withColumn("n_tokens", TextAnalysis.tokenCount(col("text"))),
      col("doc_id"), col("n_tokens"), capacity))

    // optional LLM enrichment over the curated corpus (the reference's
    // Program 2 run over Program 1's output): the distributed LLM-map
    // operator with its rate/concurrency envelope, written partitioned by
    // the ok flag so the ok/fail routing (E7) is partition-pruned on disk —
    // `10_enrich/ok=true` IS the success sink, `ok=false` the failure sink.
    enrichStage.foreach { e =>
      import spark.implicits._
      val enriched = EnrichOperator.enrich(
        para.select(col("url").as("key"), col("text").as("content"))
          .as[EnrichOperator.Doc],
        e.transportFactory, e.promptTemplate, e.config)
      val out = ck("10_enrich", enriched.toDF(), parts = Seq("ok"))
      if (countStages) {
        counts += StageCount("10_enrich_ok", out.where(col("ok")).count())
        counts += StageCount("10_enrich_fail", out.where(!col("ok")).count())
      }
    }

    counts.toSeq
  }

  /** The continuous-crawl DAEMON: watch `warcDir` for new WARC files and run
    * the full staged curation on each micro-batch of files, admitting
    * against (and growing) the persisted cross-snapshot indexes — [[run]]
    * lifted to Structured Streaming, so "a crawler keeps dropping snapshot
    * files; only novel pages ever reach the curated corpus" is one call.
    *
    * Semantics per micro-batch: the batch IS one crawl snapshot (robots
    * policy from its own fetches, canonical-URL dedup within it), then
    * delta-mode admission against everything previous batches admitted.
    * Replay safety comes from the `batch=<id>` discipline ([[run]]'s
    * snapshotId mode + per-batch work dirs): a replayed batch overwrites
    * exactly its own outputs and index deltas, reads the index WITHOUT its
    * own delta, and therefore re-derives the same admitted set. The
    * checkpointed file-source offsets make each WARC file process exactly
    * once across restarts.
    *
    * Scale shape: only the file LIST crosses the driver (the binaryFile
    * source prunes the content column away before the collect); record
    * parsing streams through [[graft.sources.WarcSource]]'s per-file
    * sequential parser on executors, thousands of files in parallel. The
    * growing `batch=` index deltas are compacted with
    * [[graft.operators.IncrementalDedup.compactSigIndex]] /
    * `compactFpIndex` / `compactRobotsIndex` (CLI `compact-index <dir>
    * <kind>`; stream stopped, per their shared contract).
    */
  def runStream(spark: SparkSession, warcDir: String, workDir: String,
      indexDir: String, agent: String = "graftbot", capacity: Long = 2048L,
      maxPayloadBytes: Int = 8 * 1024 * 1024, countStages: Boolean = true,
      // optional per-snapshot LLM enrichment (at-least-once on replay, like
      // any external effect in foreachBatch; the mock transport is exact)
      enrichStage: Option[EnrichStage] = None,
      // auto-compact the fp/sig/robots delta indexes at the START of every
      // n-th batch's foreachBatch — the one point in a streaming job with
      // no concurrent delta writers, which is exactly compactDeltaIndex's
      // contract. The current batch id is PRESERVED as a delta (a crashed
      // earlier attempt may have left one; folding it into batch=-1 would
      // defeat the replay guard and wipe the batch's own outputs).
      compactEvery: Option[Int] = None,
      qualityThresholds: QualityRules.Thresholds = QualityRules.Thresholds(),
      onBatch: (Long, Seq[StageCount]) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("binaryFile")
      // the binaryFile schema is FIXED by the format, but the streaming
      // source API still demands it spelled out
      .schema(new StructType()
        .add("path", StringType)
        .add("modificationTime", org.apache.spark.sql.types.TimestampType)
        .add("length", LongType)
        .add("content", org.apache.spark.sql.types.BinaryType))
      .option("pathGlobFilter", "*.warc*")
      .load(warcDir)
      .select(col("path"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (compactEvery.exists(n => batchId > 0 && batchId % n == 0)) {
          val s = batch.sparkSession
          val keep = Set(batchId)
          def ifPresent(sub: String)(body: String => Unit): Unit = {
            val d = s"$indexDir/$sub"
            if (new java.io.File(d).exists()) body(d)
          }
          ifPresent("fp")(d =>
            IncrementalDedup.compactFpIndex(s, d, preserveBatchIds = keep))
          ifPresent("sig")(d =>
            IncrementalDedup.compactSigIndex(s, d, preserveBatchIds = keep))
          ifPresent("robots")(d =>
            IncrementalDedup.compactRobotsIndex(s, d, preserveBatchIds = keep))
        }
        val paths = batch.select("path").distinct()
          .collect().map(_.getString(0)).sorted
        if (paths.nonEmpty) {
          val counts = run(spark, paths.mkString(","),
            s"$workDir/batch=$batchId", agent, capacity, maxPayloadBytes,
            indexDir = Some(indexDir), enrichStage = enrichStage,
            countStages = countStages, snapshotId = Some(batchId),
            qualityThresholds = qualityThresholds)
          onBatch(batchId, counts)
        }
        ()
      }
      .start()
}
