package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The LAST step of a training-data pipeline: a deterministic global
  * training ORDER. Training runs need the corpus shuffled (long same-
  * source runs destabilize loss) yet exactly reproducible — resume from
  * step N, re-run an ablation, or re-shard for a different world size, and
  * every sample must sit at the same position.
  *
  * Two constructions, both pure functions of the data (no RNG state, no
  * partition dependence — the [[Sampling]] philosophy applied to order):
  *
  *   - [[shuffleKey]] — md5 of (epoch, id): an embarrassingly parallel
  *     ORDER KEY. Materializing the order is one range-partitioned sort;
  *     Spark samples the key space, so output partitions balance no matter
  *     how skewed the sources are. New epoch string → fresh deterministic
  *     permutation. This is the 100 TB answer.
  *
  *   - [[interleave]] — strict ROUND-ROBIN across sources:
  *     `global_pos = (rank - 1) * S + source_index` with rank = per-source
  *     row_number by (shuffleKey, id). Guarantees no two consecutive
  *     occupied positions from the same source while each source lasts —
  *     the hard mixing guarantee hash order only gives asymptotically.
  *     Positions are sparse when sources differ in size (it is an order,
  *     not an array index). The per-source window makes a mega-source sort
  *     its own rows in one partition — use it for bounded curated sources
  *     and shuffleKey for open-domain scale.
  */
object TrainingOrder {

  /** Deterministic per-epoch shuffle key (lexicographic md5 order). */
  def shuffleKey(idCol: Column, epoch: Int = 0): Column =
    md5(concat(lit(epoch.toString), lit(":"), idCol.cast("string")))

  /** Deterministic shard assignment for materializing an epoch's training
    * order as files: `floor(bucket(shuffleKey) * nShards / 2^32)` with
    * `bucket` = the first 8 hex chars of the md5 shuffle key. A pure
    * function of (epoch, id) — repartition-proof, balanced in expectation,
    * window-free — and the arithmetic is exact in IEEE doubles
    * (`bucket * nShards < 2^53`, division by 2^32 is a power of two), so
    * any engine reproduces the same shard per document (the t115 oracle
    * does). Shard-range reads stay consistent with [[shuffleKey]] order:
    * shard boundaries ARE contiguous key ranges, so "train on shards
    * 0..k" is a prefix of the epoch's global order.
    */
  def shard(idCol: Column, epoch: Int, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= (1 << 20), s"nShards in [1, 2^20], got $nShards")
    floor(conv(substring(shuffleKey(idCol, epoch), 1, 8), 16, 10)
      .cast("bigint").cast("double") * nShards / 4294967296.0).cast("int")
  }

  /** Materialize the epoch's training order as `shard=<id>` parquet dirs:
    * rows land in their [[shard]] and are range-partitioned + sorted by
    * the shuffle key WITHIN each shard, so a data loader streaming shard
    * files in (shard, file, row) order replays the exact global md5 order.
    * One range shuffle — the same cost as any global sort — and nothing
    * ever funnels through a single partition.
    *
    * @return the written frame read back (input columns + `skey`, `shard`)
    */
  def writeShards(df: DataFrame, idCol: Column, outDir: String,
      nShards: Int, epoch: Int = 0): DataFrame = {
    val keyed = df
      .withColumn("skey", shuffleKey(idCol, epoch))
      .withColumn("shard", shard(idCol, epoch, nShards))
    keyed
      .repartitionByRange(math.max(1, nShards), col("skey"))
      .sortWithinPartitions(col("skey"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    df.sparkSession.read.schema(keyed.schema).parquet(outDir)
  }

  /** Strict round-robin positions for the given source values; rows whose
    * source is not listed are dropped (train on declared mixtures only).
    * Output: input columns + `skey`, `source_idx`, `global_pos`.
    */
  def interleave(df: DataFrame, sourceCol: Column, idCol: Column,
      sources: Seq[String], epoch: Int = 0): DataFrame = {
    require(sources.nonEmpty && sources.distinct.size == sources.size,
      "sources must be distinct and non-empty")
    val idx = sources.zipWithIndex.tail.foldLeft(
      when(sourceCol === sources.head, lit(0L))) {
      case (acc, (v, i)) => acc.when(sourceCol === v, lit(i.toLong))
    }
    val w = Window.partitionBy(sourceCol)
      .orderBy(col("skey"), idCol)
    df.withColumn("skey", shuffleKey(idCol, epoch))
      .withColumn("source_idx", idx)
      .where(col("source_idx").isNotNull)
      .withColumn("global_pos",
        (row_number().over(w).cast("bigint") - 1) * sources.size + col("source_idx"))
  }
}
