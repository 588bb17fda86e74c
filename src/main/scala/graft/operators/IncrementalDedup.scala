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
}
