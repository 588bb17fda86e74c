package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling: every sample here is a pure function of the data,
  * not of RNG state, partitioning, or cluster size — rerun the job on 10 or
  * 10,000 executors and the SAME rows come back, and any other engine can
  * reproduce the selection from the same md5 arithmetic (the oracle does).
  *
  * That reproducibility is what dataset work at 100 TB actually needs:
  * ablations on "the same 1%", debuggable lineage from a sampled row back
  * to its source, and no torn samples when a stage is retried. Spark's
  * `df.sample()` guarantees none of it (seeded per-partition RNG changes
  * membership whenever partitioning changes).
  */
object Sampling {

  /** Keyed Bernoulli sample: keeps a row iff the md5-derived bucket of its
    * key falls below `fraction` of the 2^32 key space. Deterministic,
    * engine-independent, and composable — the SAME key always lands on the
    * same side, so two tables sampled on a shared key stay join-consistent
    * (sample-then-join == join-then-sample).
    */
  def bernoulli(key: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0)
    val bucket = conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
    bucket < (fraction * 4294967296.0).toLong
  }

  /** Exactly `k` rows per group (fewer when the group is smaller):
    * deterministic "reservoir" = the k smallest md5 draws within each
    * group, with the key itself as the unique tiebreak. One window over
    * the group key — the same shuffle an aggregation over those groups
    * would pay; no per-executor reservoir state to merge.
    */
  def perGroup(df: DataFrame, groupCol: Column, key: Column, k: Int): DataFrame = {
    require(k >= 1)
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(key.cast("string")), key.cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }
}
