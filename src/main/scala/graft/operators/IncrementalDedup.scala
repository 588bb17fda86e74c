package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental corpus admission: dedup a NEW batch of documents against a
  * persisted fingerprint index built from everything already admitted, then
  * fold the survivors into the index — the shape a continuously-crawling
  * 100 TB pipeline actually runs (each crawl snapshot dedups against the
  * accumulated corpus; nothing recomputes history). Reference analog: the
  * incremental skip of already-processed inputs in
  * `/root/reference/src/program2_ai_processor.py` (P9/J2), lifted from
  * file-name granularity to content-fingerprint granularity.
  *
  * Scale design:
  *  - The index carries ONLY fingerprints (16-byte md5 per distinct
  *    document) — at 10^10 documents that is a few hundred GB of state,
  *    storable as plain parquet and equi-joinable, while the documents
  *    themselves never re-enter the job.
  *  - Admission is one LEFT ANTI equi-join on the fingerprint (AQE handles
  *    skew; a hot fingerprint IS a mass-duplicate and collapses anyway)
  *    plus one hash aggregation for first-wins within the batch. The
  *    within-batch step uses `min_by` under a `groupBy` — NOT a ranking
  *    window — so duplicates collapse map-side before the shuffle; a crawl
  *    batch with a viral page duplicated 10^6 times shuffles one row per
  *    partition for it, not 10^6.
  *  - `updatedIndex` is a union + distinct of fingerprints only; persisted
  *    back, it makes the next batch's admission independent of this one's
  *    inputs.
  *
  * The streaming twin is [[graft.streaming.StreamingOps.dedupDocsStream]]:
  * its flatMapGroupsWithState seen-set plays the index role across
  * micro-batches with the same first-wins admission semantics, and a
  * batch/stream equivalence spec pins the two together (StreamingSpec).
  */
object IncrementalDedup {

  /** Fingerprint index of an already-admitted corpus: one row per distinct
    * content fingerprint, column `fp`.
    */
  def buildIndex(df: DataFrame, fp: Column): DataFrame =
    df.select(fp.as("fp")).distinct()

  /** Admit the batch rows whose fingerprint is not in the index, keeping
    * the first row (by `orderCol`, which must be unique) per fingerprint
    * within the batch. All caller columns survive, plus `fp`.
    */
  def admit(batch: DataFrame, index: DataFrame, fp: Column,
      orderCol: Column): DataFrame = {
    val cols = batch.columns
    val fresh = batch
      .withColumn("fp", fp)
      .join(index.select(col("fp")), Seq("fp"), "left_anti")
    // first-wins as an argmin aggregation: min_by over the row struct keyed
    // by the (unique) order column — partial-aggregates map-side, unlike a
    // row_number window which must co-locate every duplicate before ranking
    fresh
      .groupBy(col("fp"))
      .agg(min_by(struct(cols.map(col): _*), orderCol).as("__row"))
      .select(col("fp") +: cols.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** The index after folding in an admitted batch (`admit` output or any
    * frame carrying `fp`). Persist this; it replaces the old index.
    */
  def updatedIndex(index: DataFrame, admitted: DataFrame): DataFrame =
    index.select(col("fp")).union(admitted.select(col("fp"))).distinct()

  // ------------------------------------------------------- near-dup variant

  /** MinHash signature index of an already-admitted corpus: (id, sig) with
    * sig = array<bigint> of length k — the state a 100 TB crawl can
    * actually persist for NEAR-dup admission (k longs per document; the
    * shingle sets themselves never need to be stored or recomputed).
    * Similarity is measured in signature space throughout this family:
    * matches/k (graft_sig_match_count) is the standard unbiased Jaccard
    * estimate, deterministic given the signatures.
    */
  def buildSigIndex(df: DataFrame, idCol: Column, textCol: Column,
      shingleWords: Int = 3, k: Int = 32): DataFrame =
    df.select(idCol.as("id"),
      graft.expressions.GraftFunctions
        .minhashSig(textCol, shingleWords, k).as("sig"))

  /** The signature index after folding in an `admitNearDup` result (which
    * carries `id` and `sig`).
    */
  def updatedSigIndex(sigIndex: DataFrame, admitted: DataFrame): DataFrame =
    sigIndex.select(col("id"), col("sig"))
      .unionByName(admitted.select(col("id"), col("sig")))

  /** Maintenance for an APPEND-grown signature index
    * ([[graft.streaming.StreamingOps.admitNearDupStream]] adds one
    * `batch=<id>` delta per micro-batch): rewrite the accumulated deltas as
    * one compact table sized to `targetRows` per file, then swap it in
    * (write-then-rename — a killed compaction never touches the live
    * index). Without this a long-running stream degrades every future
    * micro-batch with thousands-of-tiny-files scan overhead — the same
    * small-file failure mode the generic layout compactor exists for,
    * specialized to the index's (id, sig) schema and swap discipline.
    *
    * @return number of signatures in the compacted index
    */
  def compactSigIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, targetRows: Long = 4_000_000L): Long = {
    val index = spark.read.parquet(indexDir).select(col("id"), col("sig"))
      .localCheckpoint()
    val n = index.count()
    val files = math.max(1L, (n + targetRows - 1) / targetRows).toInt
    val next = s"$indexDir.compact"
    index.repartition(files).write.mode("overwrite").parquet(next)
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(indexDir))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    finally walk.close()
    java.nio.file.Files.move(java.nio.file.Paths.get(next),
      java.nio.file.Paths.get(indexDir))
    n
  }

  /** NEAR-dup incremental admission: reject batch documents whose signature
    * similarity to an already-admitted document reaches `minMatches` of `k`
    * (e.g. 26/32 ≈ Jaccard 0.8), then keep one representative (min id) per
    * near-dup cluster WITHIN the surviving batch. Candidate generation is
    * LSH banding on both steps — the only pairs ever scored are band
    * collisions, so the work is near-linear in the batch; the admission
    * contract is therefore "banded candidates scored exactly in signature
    * space" (an LSH band miss can admit a borderline pair — the standard
    * recall trade every production near-dedup makes; exact duplicates can
    * NEVER slip through, since identical signatures collide in every band).
    *
    * Scale shape: bands of the (small) batch join bands of the (large)
    * index on (band position, band hash) — an equi-join whose index side
    * can be bucketed by band hash on disk; signatures are re-attached only
    * to surviving candidates. Within-batch clustering runs star-contraction
    * over the batch's own collision graph. History work is O(batch
    * collisions), never O(corpus).
    *
    * @return the admitted rows (all caller columns + `sig`); fold them into
    *         the index with [[updatedSigIndex]].
    */
  def admitNearDup(batch: DataFrame, sigIndex: DataFrame, idCol: String,
      textCol: String, shingleWords: Int = 3, k: Int = 32, nBands: Int = 8,
      minMatches: Int = 26): DataFrame = {
    require(k % nBands == 0, s"k must split into bands, got k=$k bands=$nBands")
    require(minMatches >= 1 && minMatches <= k,
      s"minMatches in [1,$k], got $minMatches")
    val cols = batch.columns
    val bs = batch.select(
      struct(cols.map(col): _*).as("__row"), col(idCol).as("id"),
      graft.expressions.GraftFunctions
        .minhashSig(col(textCol), shingleWords, k).as("sig"))
    def explodeBands(df: DataFrame): DataFrame =
      df.select(col("id"),
        posexplode(DedupOps.bands(col("sig"), nBands, k / nBands))
          .as(Seq("band_idx", "band_hash")))
    val simOk = graft.expressions.GraftFunctions
      .sigMatchCount(col("sig_a"), col("sig_b")) >= minMatches

    // cross step: batch band -> index band, exact signature score on the
    // collisions only; one distinct id set of rejected batch docs
    val bBands = explodeBands(bs)
      .select(col("id").as("bid"), col("band_idx"), col("band_hash"))
    val iBands = explodeBands(sigIndex)
      .select(col("id").as("iid"), col("band_idx"), col("band_hash"))
    val rejected = bBands.join(iBands, Seq("band_idx", "band_hash"))
      .select(col("bid"), col("iid")).distinct()
      .join(bs.select(col("id").as("bid"), col("sig").as("sig_a")), Seq("bid"))
      .join(sigIndex.select(col("id").as("iid"), col("sig").as("sig_b")), Seq("iid"))
      .where(simOk)
      .select(col("bid").as("id")).distinct()
    // materialized: the survivor frame feeds the within-batch band
    // self-join, the cluster node list and the final representative join —
    // without the checkpoint the cross-index anti-join re-executes once per
    // consumer (star contraction alone reads it three times)
    val survivors = bs.join(rejected, Seq("id"), "left_anti").localCheckpoint()

    // within-batch step: collision graph among survivors, min-id per cluster
    val sBands = explodeBands(survivors)
    val pairs = sBands.alias("a")
      .join(sBands.alias("b"), Seq("band_idx", "band_hash"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .where(col("id_a") < col("id_b")).distinct()
      .join(survivors.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(survivors.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .where(simOk)
      .select(col("id_a"), col("id_b"))
    val comps = DedupClusters.connectedComponentsStars(
      survivors.select(col("id")), pairs, "id")
    survivors.join(comps, Seq("id"))
      .where(col("id") === col("component"))
      .select(col("id") +: col("sig") +: cols.map(c => col(s"__row.$c").as(c)): _*)
  }
}
