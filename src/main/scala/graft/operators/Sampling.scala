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

  /** EXACT token-budget mix assembly — the deterministic-prefix sibling of
    * [[toTokenBudgets]]: where that keeps rows at an expected RATE, this
    * admits, per group, the maximal prefix of the md5-ordered documents
    * whose running token mass stays strictly under the group's budget — so
    * the admitted token count is exactly determined (never exceeds budget +
    * one document), membership is still a pure function of the data, and
    * ablating "the same 30B-token web slice" is reproducible row-for-row.
    *
    * The naive formulation is a running-sum window over each whole group —
    * the skew wall [[toShares]] documents (a handful of languages = window
    * partitions as large as the largest group). This implementation removes
    * it by decomposing the hash order into 4096 buckets (first 3 hex chars
    * of the md5 — bucket order IS hash-prefix order):
    *
    *  1. one aggregation builds the per-(group, bucket) token ledger — at
    *     most `|groups| * 4096` rows, so its prefix-sum window is driver-
    *     scale work no matter how big the data is;
    *  2. buckets whose ledger prefix ends strictly under the budget admit
    *     every row with NO window at all (a broadcast ledger join + filter);
    *  3. only the boundary bucket — at most ONE per group — pays a per-row
    *     running-sum window, bounded to ~1/4096 of its group.
    *
    * The decomposition is exact, not approximate: a row is admitted iff
    * `ledgerPrefix(bucket) + inBucketPrefix(row) < budget`, which equals the
    * naive global running sum because bucket order refines hash order (the
    * oracle recomputes the naive form and must hash-match). Groups absent
    * from the recipe are dropped ([[toTokenBudgets]] convention). Weights
    * must be non-negative; zero-weight rows admit with the prefix they land
    * in (strict `<` keeps the rule total).
    */
  def exactTokenBudgets(df: DataFrame, groupCol: Column, key: Column,
      weight: Column, budgets: Seq[(String, Long)]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_._2 >= 0L),
      "token budgets must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    exactPrefix(df, groupCol, key, weight, budgets.toDF("__grp", "__budget"))
  }

  /** [[exactTokenBudgets]]'s machinery over a budgets FRAME
    * (`__grp` string, `__budget` long) — the internal form [[repeatToBudget]]
    * needs, whose remainder budgets are computed from the data rather than
    * written in the recipe.
    */
  private def exactPrefix(df: DataFrame, groupCol: Column, key: Column,
      weight: Column, bDf: DataFrame): DataFrame = {
    val tagged = df
      .withColumn("__grp", groupCol.cast("string"))
      .withColumn("__h", md5(key.cast("string")))
      .withColumn("__bucket", conv(substring(col("__h"), 1, 3), 16, 10).cast("int"))
      .withColumn("__w", weight.cast("bigint"))
    // bounded ledger: exclusive token prefix per (group, bucket)
    val ledgerWnd = Window.partitionBy(col("__grp")).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ledger = tagged.groupBy(col("__grp"), col("__bucket"))
      .agg(sum(col("__w")).as("__btok"))
      .withColumn("__bcum", coalesce(sum(col("__btok")).over(ledgerWnd), lit(0L)))
      .join(bDf, "__grp")
      .select(col("__grp"), col("__bucket"), col("__bcum"), col("__budget"),
        // full: every row of the bucket fits under the budget even if the
        // bucket's mass lands entirely before a trailing zero-weight row
        (col("__bcum") + col("__btok") < col("__budget")).as("__full"),
        (col("__bcum") < col("__budget")).as("__open"))
    val joined = tagged.join(broadcast(ledger), Seq("__grp", "__bucket"))
    val fullRows = joined.where(col("__full"))
    val inBucketWnd = Window.partitionBy(col("__grp"), col("__bucket"))
      .orderBy(col("__h"), key.cast("string"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundaryRows = joined.where(!col("__full") && col("__open"))
      .withColumn("__incum", coalesce(sum(col("__w")).over(inBucketWnd), lit(0L)))
      .where(col("__bcum") + col("__incum") < col("__budget"))
      .drop("__incum")
    fullRows.unionByName(boundaryRows)
      .drop("__grp", "__h", "__bucket", "__w", "__bcum", "__budget", "__full", "__open")
  }

  /** Materialize the DATA-CONSTRAINED side of a recipe — what
    * [[mixFeasibility]]'s `repeat` status forecasts (budget > supply, the
    * regime where training must revisit data; Muennighoff et al. 2023):
    * per group with budget `B` and token mass `T`, emit `k = B div T` FULL
    * epochs of the group (every row, epoch ids `0..k-1`) plus a partial
    * epoch `k` holding the maximal md5-ordered prefix whose running mass
    * stays strictly under the remainder `B mod T` — so the emitted mass is
    * exactly determined (k·T + a prefix that never exceeds the remainder
    * plus one document) and membership/multiplicity is a pure function of
    * the data. With `B <= T` this IS [[exactTokenBudgets]] with an
    * `epoch = 0` column (k = 0, remainder = B) — one definition of "admit
    * under a budget" across both regimes, spec-pinned.
    *
    * The `epoch` column is the handle downstream ordering salts on
    * (`TrainingOrder.interleave(epoch = ...)`) so repeated data is
    * revisited in a DIFFERENT deterministic order each epoch instead of
    * replaying one sequence k times. Groups in the recipe but absent from
    * the corpus emit nothing (you cannot repeat what does not exist) —
    * [[mixFeasibility]]'s `missing` row is the audit signal for that case;
    * a zero-mass group with a positive budget emits its rows once
    * (epoch 0, the [[exactTokenBudgets]] zero-weight convention).
    *
    * Scale shape: full epochs are a broadcast join (|groups| rows) plus a
    * narrow `explode` — NO shuffle, and the k-fold blowup is the requested
    * output, not overhead; only the partial epoch pays the bucket-ledger
    * prefix machinery (skew-wall-free, see [[exactTokenBudgets]]). All
    * epoch arithmetic (`div`/`mod`) is exact integer, cross-engine.
    */
  def repeatToBudget(df: DataFrame, groupCol: Column, key: Column,
      weight: Column, budgets: Seq[(String, Long)]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_._2 >= 0L),
      "token budgets must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val bDf = budgets.toDF("__grp", "__budget")
    val tagged = df.withColumn("__grp", groupCol.cast("string"))
    val totals = tagged.groupBy(col("__grp"))
      .agg(sum(weight.cast("bigint")).as("__tok"))
    // k full epochs + a remainder budget; T = 0 degenerates to k = 0 with
    // the whole budget in the partial epoch (zero-weight rows admit once).
    // |groups| rows, collected ONCE so the token-mass aggregation (a full
    // scan) never replays under the three consumer branches — the bounded
    // driver-state convention (cf. ivfAppend's centroid fetch); everything
    // downstream joins literal frames.
    val sized: Seq[(String, Long, Long)] = totals.join(bDf, "__grp")
      .select(col("__grp"),
        when(col("__tok") > 0, expr("__budget div __tok"))
          .otherwise(lit(0L)).as("__k"),
        when(col("__tok") > 0, col("__budget") % col("__tok"))
          .otherwise(col("__budget")).as("__rem"))
      .as[(String, Long, Long)].collect().toSeq
    // sequence() is ascending-or-DESCENDING (k = 0 would yield [0, -1]),
    // so groups without a full epoch must not reach the explode
    val fullEpochs = tagged
      .join(broadcast(sized.filter(_._2 >= 1L).map(t => (t._1, t._2))
        .toDF("__grp", "__k")), "__grp")
      .withColumn("epoch", explode(sequence(lit(0L), col("__k") - 1L)))
      .drop("__grp", "__k")
    val partial = exactPrefix(df, groupCol, key, weight,
        sized.map(t => (t._1, t._3)).toDF("__grp", "__budget"))
      .withColumn("__grp", groupCol.cast("string"))
      .join(broadcast(sized.map(t => (t._1, t._2)).toDF("__grp", "__k")), "__grp")
      .withColumn("epoch", col("__k"))
      .drop("__grp", "__k")
    fullEpochs.unionByName(partial)
  }

  /** Mix FEASIBILITY forecast — the planning report read BEFORE running
    * [[toTokenBudgets]]/[[exactTokenBudgets]]: for every group in the
    * recipe or the corpus, what the recipe would actually do. Per group:
    * available docs/tokens, the budget, the keep rate the rate-based
    * sampler would apply, `epochs = budget / tokens` (how many passes over
    * the source the budget demands — > 1 means the recipe upsamples, the
    * data-constrained regime where repetition cost kicks in), and the
    * token deficit/surplus. Status classifies each line: `repeat` (budget
    * exceeds supply), `downsample`, `exact`, `missing` (budgeted group
    * absent from the corpus — a recipe typo or an empty source), and
    * `unbudgeted` (corpus group the recipe drops — its whole token mass is
    * surplus). The full outer join is what makes the report an AUDIT: both
    * failure directions (typo'd recipe key, surprise corpus group) surface
    * as rows instead of silently sampling to zero.
    *
    * Scale shape: one hash aggregation over one scan, then a full-outer
    * join against the literal recipe (|groups| rows). Cross-engine parity:
    * counts and deficits are exact integer arithmetic; `keep_rate` and
    * `epochs` are single IEEE divisions of exact integers.
    */
  def mixFeasibility(df: DataFrame, groupCol: Column, weight: Column,
      budgets: Seq[(String, Long)]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_._2 >= 0L),
      "token budgets must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val bDf = budgets.toDF("group", "budget")
    val totals = df.groupBy(groupCol.cast("string").as("group"))
      .agg(count(lit(1)).as("docs_available"),
        sum(weight.cast("bigint")).as("tokens_available"))
    totals.join(bDf, Seq("group"), "full_outer")
      .select(
        col("group"),
        coalesce(col("docs_available"), lit(0L)).as("docs_available"),
        coalesce(col("tokens_available"), lit(0L)).as("tokens_available"),
        col("budget"))
      .select(
        col("group"), col("docs_available"), col("tokens_available"),
        col("budget"),
        when(col("budget").isNull || col("tokens_available") === 0L,
          lit(null).cast("double"))
          .when(col("budget") >= col("tokens_available"), lit(1.0))
          .otherwise(col("budget").cast("double") /
            col("tokens_available").cast("double"))
          .as("keep_rate"),
        when(col("budget").isNull || col("tokens_available") === 0L,
          lit(null).cast("double"))
          .otherwise(col("budget").cast("double") /
            col("tokens_available").cast("double"))
          .as("epochs"),
        when(col("budget").isNull, lit(0L))
          .otherwise(greatest(col("budget") - col("tokens_available"), lit(0L)))
          .as("deficit_tokens"),
        when(col("budget").isNull, col("tokens_available"))
          .otherwise(greatest(col("tokens_available") - col("budget"), lit(0L)))
          .as("surplus_tokens"),
        when(col("budget").isNull, lit("unbudgeted"))
          .when(col("tokens_available") === 0L, lit("missing"))
          .when(col("budget") > col("tokens_available"), lit("repeat"))
          .when(col("budget") === col("tokens_available"), lit("exact"))
          .otherwise(lit("downsample"))
          .as("status"))
      .orderBy(col("group"))
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
