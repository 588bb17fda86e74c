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
