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

  /** Downsample to a target group mixture (the data-mixing step every
    * multilingual / multi-source training corpus goes through): given target
    * shares per group value (e.g. `en -> 0.4, de -> 0.15, ...`), keep the
    * LARGEST sample obtainable at exactly those expected proportions without
    * upsampling any group — the overall budget is `min_g(count_g / share_g)`
    * and each group keeps rows at rate `budget * share_g / count_g`.
    *
    * Membership is the same keyed-Bernoulli rule as [[bernoulli]], so the
    * selection is a pure function of the data: no per-group total order, no
    * window — one count aggregation plus a broadcast of one tiny rate row
    * per group, then an embarrassingly parallel filter. That is deliberate:
    * the exact-quota alternative (rank within group, keep the first
    * `floor(budget*share_g)`) needs a per-group global sort whose partitions
    * are as large as the largest group — a skew wall at 100 TB with a
    * handful of languages — while the Bernoulli rate concentrates to the
    * quota with relative error O(1/sqrt(quota)) exactly when quotas are
    * huge. Groups without a configured share are dropped.
    */
  def toShares(df: DataFrame, groupCol: Column, key: Column,
      shares: Seq[(String, Double)]): DataFrame = {
    require(shares.nonEmpty && shares.forall(_._2 > 0.0), "shares must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val sharesDf = shares.toDF("__grp", "__share")
    val tagged = df.withColumn("__grp", groupCol.cast("string"))
    val counts = tagged.groupBy(col("__grp")).agg(count(lit(1)).as("__cnt"))
    // budget = the largest output size at the target mixture that upsamples
    // nothing; per-group keep rate in [0, 1] by construction.
    val sized = counts.join(sharesDf, "__grp")
    val budget = sized.agg(min(col("__cnt").cast("double") / col("__share")).as("__budget"))
    val rates = sized.crossJoin(budget)
      .select(col("__grp"),
        (col("__budget") * col("__share") / col("__cnt").cast("double")).as("__rate"))
    val bucket = conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
    tagged.join(broadcast(rates), "__grp")
      .where(bucket.cast("double") < col("__rate") * lit(4294967296.0))
      .drop("__grp", "__rate")
  }

  /** Temperature-balanced downsampling at alpha = 1/2 — the standard
    * "flatten the source mixture toward uniform" step for multilingual /
    * multi-source corpora (rare groups keep everything, dominant groups are
    * pulled toward the rare ones): group `g` keeps rows at rate
    * `sqrt(c_min / c_g)`, so expected sizes are `sqrt(c_min * c_g)` — the
    * geometric mean of "keep all" and "cap at the smallest group".
    *
    * alpha = 1/2 is deliberate, not a simplification: its rate needs only
    * one division and one square root, BOTH correctly rounded under IEEE 754
    * (`pow`/`ln` are not), so the selection is bit-reproducible on any
    * engine — the DuckDB oracle re-derives the exact same doubles. Same
    * scale shape as [[toShares]]: one count aggregation, a broadcast rate
    * row per group, then a pure-function-of-the-key filter. No window, no
    * skew wall.
    */
  def temperatureBalance(df: DataFrame, groupCol: Column, key: Column): DataFrame = {
    val tagged = df.withColumn("__grp", groupCol.cast("string"))
    val counts = tagged.groupBy(col("__grp")).agg(count(lit(1)).as("__cnt"))
    val minCnt = counts.agg(min(col("__cnt")).as("__min"))
    val rates = counts.crossJoin(minCnt)
      .select(col("__grp"),
        sqrt(col("__min").cast("double") / col("__cnt").cast("double")).as("__rate"))
    val bucket = conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
    tagged.join(broadcast(rates), "__grp")
      .where(bucket.cast("double") < col("__rate") * lit(4294967296.0))
      .drop("__grp", "__rate")
  }

  /** Sample each group down to a TOKEN budget — the "data recipe" step:
    * training mixtures are specified in tokens per source ("300B web, 50B
    * code, ..."), not rows. Group `g` keeps rows at rate
    * `min(1, budget_g / tokens_g)` so the expected sampled token mass meets
    * the budget without upsampling; groups absent from the recipe are
    * DROPPED (a recipe is exhaustive by definition). The rate is one IEEE
    * division of exact integer sums and membership is a pure function of
    * the key (keyed md5 — repartition-proof, join-consistent, the
    * [[bernoulli]]/[[toShares]] convention, so the same doc survives in
    * every recipe that gives its group the same rate). Same scale shape as
    * [[toShares]]: one sum aggregation, broadcast rates, a narrow filter —
    * no window, no skew wall.
    */
  def toTokenBudgets(df: DataFrame, groupCol: Column, key: Column,
      weight: Column, budgets: Seq[(String, Long)]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_._2 >= 0L),
      "token budgets must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val bDf = budgets.toDF("__grp", "__budget")
    val tagged = df.withColumn("__grp", groupCol.cast("string"))
    val totals = tagged.groupBy(col("__grp"))
      .agg(sum(weight.cast("bigint")).as("__tok"))
    val rates = totals.join(bDf, "__grp")
      .select(col("__grp"),
        when(col("__budget") >= col("__tok"), lit(1.0))
          .otherwise(col("__budget").cast("double") / col("__tok").cast("double"))
          .as("__rate"))
    val bucket = conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
    tagged.join(broadcast(rates), "__grp")
      .where(bucket.cast("double") < col("__rate") * lit(4294967296.0))
      .drop("__grp", "__rate")
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
