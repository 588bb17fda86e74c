package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the per-column quality report a dataset release
  * ships with (and the input to drift detection between two snapshots):
  * row count, null count, exact distinct count, min/max rendered as
  * strings so heterogeneous columns stack in one long-format frame.
  *
  * Shape: ONE aggregation over ONE scan computes every stat (Spark plans
  * the multiple distinct aggregates through a single Expand — the table is
  * read once, never once per column), then a `stack` unpivots the single
  * result row into `n_cols` rows. No collect, no per-column jobs. Exact
  * distinct is the one shuffle-expensive stat; callers profiling a 100 TB
  * table pass `exact = false` to swap in `approx_count_distinct` and keep
  * the report shape identical.
  */
object Profiler {

  /** Exact-name reference: backtick-quoted with embedded backticks doubled,
    * so a name containing dots, quotes or backticks resolves as ONE
    * identifier instead of being parsed — the CLI feeds user-typed column
    * names straight into `profile`.
    */
  private def ref(name: String): Column = col("`" + name.replace("`", "``") + "`")

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def distinctAgg(v: Column): Column =
      if (exact) countDistinct(v) else approx_count_distinct(v)
    // Internal aliases are INDEX-based (never derived from user column
    // names), so the only place a user name appears is as a quoted input
    // reference or a literal label — nothing user-controlled is ever parsed.
    val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(ref(c).isNull, 1L).otherwise(0L)).as(s"__c${i}_nulls"),
        distinctAgg(ref(c)).cast("bigint").as(s"__c${i}_distinct"),
        min(ref(c)).cast("string").as(s"__c${i}_min"),
        max(ref(c)).cast("string").as(s"__c${i}_max"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    // Typed unpivot (explode over per-column structs) instead of a spliced
    // `stack(...)` selectExpr: same one-row -> n_cols-rows shape, no SQL
    // string assembly.
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col(s"__c${i}_nulls").as("n_nulls"),
        col(s"__c${i}_distinct").as("n_distinct"), col(s"__c${i}_min").as("min_value"),
        col(s"__c${i}_max").as("max_value"))
    }
    row.select(col("__rows"), explode(array(entries: _*)).as("__e"))
      .select(col("__e.column").as("column"), col("__rows").as("n_rows"),
        col("__e.n_nulls").as("n_nulls"), col("__e.n_distinct").as("n_distinct"),
        col("__e.min_value").as("min_value"), col("__e.max_value").as("max_value"))
  }

  /** Drift report between two snapshots of the same logical dataset:
    * per-column null-rate and distinct-count deltas plus min/max changes —
    * the cheap early-warning signal that an upstream extractor changed
    * (a field going 0.1% -> 40% null is a broken parser, not data).
    * Columns present in only one side are reported with nulls on the
    * other, so schema drift is visible in the same frame.
    */
  /** Power-of-two histogram bucket for numeric dimensions of
    * [[distributionDrift]]: keep the top 5 bits (`(x >> s) << s` with
    * `s = max(bitlength - 5, 0)`) — the [[QuantileHist]] sketch's bucket
    * arithmetic, so buckets are exact integers any engine reproduces
    * (never float quantile edges). ~16-32 buckets per power of two of
    * range; null and non-positive values fall through to the null
    * category.
    */
  def log2Bucket(c: Column): Column = {
    val s = greatest(length(bin(c.cast("bigint"))) - 5, lit(0))
    // call_function: the Scala shiftleft/shiftright overloads only take a
    // literal Int shift; the SQL functions take any expression
    when(c.isNotNull && c > 0,
      call_function("shiftleft",
        call_function("shiftright", c.cast("bigint"), s), s))
  }

  /** Distribution-SHAPE drift between two snapshots — the signal
    * [[drift]]'s column profile cannot see: null rates and ranges can sit
    * still while the language mix or the length distribution silently
    * shifts under a changed crawl frontier (and a shifted mix is a changed
    * TRAINING RECIPE downstream — the corpus-side analog of the ANN
    * tier's quantizer-drift diagnostic). Each dimension is a named
    * categorical expression (bucket numerics first — [[log2Bucket]]);
    * output is one row per (dim, value) with both counts, both shares,
    * the share delta, and the dimension's total-variation distance
    * `TV = Σ_v |p_after(v) − p_before(v)| / 2 ∈ [0, 1]` repeated per row.
    *
    * Cross-engine determinism (the oracle-hash discipline): every double
    * is a SINGLE division of exactly-computed integers — shares are
    * `n/N`, and TV folds as the exact integer sum
    * `Σ|n_after·N_before − n_before·N_after|` (decimal arithmetic, no
    * float accumulation, order-free) divided once by
    * `2·N_after·N_before`. Null dimension values are folded into a
    * `"(null)"` category BEFORE the join (equi-joins drop null keys).
    *
    * Scale shape: ONE scan per side exploding each row into its
    * (dim, value) pairs, one hash aggregation each down to category
    * cardinality; everything after runs on category-scale rows (the tiny
    * per-dim totals broadcast). No data-scale window, no collect.
    */
  def distributionDrift(before: DataFrame, after: DataFrame,
      dims: Seq[(String, Column)]): DataFrame = {
    require(dims.nonEmpty, "distributionDrift needs at least one dimension")
    driftFromCounts(dimCounts(before, dims), dimCounts(after, dims))
  }

  /** One side's (dim, value, n) category counts — ONE scan exploding each
    * row into its dimension values, one hash aggregation. This is also the
    * PROFILE a snapshot persists so later snapshots can drift-check against
    * accumulated history without rereading it ([[driftFromCounts]]).
    */
  def dimCounts(df: DataFrame, dims: Seq[(String, Column)]): DataFrame = df
    .select(explode(array(dims.map { case (name, c) =>
      struct(lit(name).as("dim"),
        coalesce(c.cast("string"), lit("(null)")).as("value"))
    }: _*)).as("__e"))
    .groupBy(col("__e.dim").as("dim"), col("__e.value").as("value"))
    .agg(count(lit(1)).as("n"))

  /** [[distributionDrift]] over pre-aggregated (dim, value, n) counts —
    * the incremental form: a persisted profile (counts summed across
    * snapshots) on one side, a fresh snapshot's [[dimCounts]] on the other.
    */
  def driftFromCounts(before: DataFrame, after: DataFrame): DataFrame = {
    val cb = before.select(col("dim"), col("value"), col("n").as("n_before"))
    val ca = after.select(col("dim"), col("value"), col("n").as("n_after"))
    val joined = cb.join(ca, Seq("dim", "value"), "full_outer")
      .select(col("dim"), col("value"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
    // Per-dim totals and the TV numerator fold as WINDOW sums over the
    // already-aggregated joined frame — a groupBy + re-join would leave the
    // totals branch recomputing the whole subtree (the data-scale scans
    // twice over; static plans don't reuse exchanges). The window partitions
    // by dim over CATEGORY-scale rows only. All three sums share one spec,
    // so this is a single Window operator.
    val byDim = org.apache.spark.sql.expressions.Window.partitionBy(col("dim"))
    // 18+18 digits: the product stays inside decimal(38,0) EXACTLY (19,0
    // would need precision 39 and silently round); counts are < 1e18 by
    // construction (row counts)
    val dec = "decimal(18,0)"
    joined
      .withColumn("__tb", sum(col("n_before")).over(byDim))
      .withColumn("__ta", sum(col("n_after")).over(byDim))
      .withColumn("__num", abs(
        col("n_after").cast(dec) * col("__tb").cast(dec) -
          col("n_before").cast(dec) * col("__ta").cast(dec)))
      .withColumn("share_before",
        when(col("__tb") > 0, col("n_before").cast("double") / col("__tb")))
      .withColumn("share_after",
        when(col("__ta") > 0, col("n_after").cast("double") / col("__ta")))
      .withColumn("share_delta",
        coalesce(col("share_after"), lit(0.0)) -
          coalesce(col("share_before"), lit(0.0)))
      .withColumn("tv", when(col("__tb") > 0 && col("__ta") > 0,
        sum(col("__num")).over(byDim).cast("double") /
          (lit(2.0) * col("__tb").cast("double") * col("__ta").cast("double"))))
      .select(col("dim"), col("value"), col("n_before"), col("n_after"),
        col("share_before"), col("share_after"), col("share_delta"), col("tv"))
  }

  /** Filter IMPACT report — what a boolean keep-predicate does to the
    * corpus MIX, per group: docs/tokens before, kept and removed, the
    * keep rates, and the group's token share of the corpus before vs
    * after the filter. `share_delta` is the line a curation operator
    * actually reads: a quality filter that silently halves a language's
    * share of the mix is a recipe change, not a cleanup — the filter-side
    * analog of [[distributionDrift]] (which compares two corpora; this
    * compares one corpus with and without a predicate, in one pass).
    * Generic over the predicate: Gopher rules, langid confidence,
    * contamination flags — anything boolean.
    *
    * Scale shape: ONE scan, one hash aggregation to group cardinality
    * (kept masses fold as conditional sums in the same aggregate — the
    * filtered side is never re-scanned); the two corpus totals fold as
    * window sums over the aggregated category frame, so the scan subtree
    * is never recomputed. Cross-engine parity: all counts
    * are exact integer sums; every rate/share is a single IEEE division;
    * `share_delta` subtracts two such divisions (exact given identical
    * operands).
    */
  def filterImpact(df: DataFrame, groupCol: Column, keep: Column,
      weight: Column): DataFrame = {
    val w = weight.cast("bigint")
    val perGroup = df
      .groupBy(groupCol.cast("string").as("group"))
      .agg(
        count(lit(1)).as("docs_before"),
        sum(when(keep, 1L).otherwise(0L)).as("docs_kept"),
        sum(w).as("tokens_before"),
        sum(when(keep, w).otherwise(0L)).as("tokens_kept"))
    // corpus totals fold as WINDOW sums over the already-aggregated
    // category frame (driftFromCounts' discipline) — an agg + crossJoin
    // would leave the totals branch recomputing the whole scan subtree
    // (static plans don't reuse exchanges); the constant partition key
    // moves only |groups| rows through one task
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    perGroup
      .withColumn("__tot_before", sum(col("tokens_before")).over(whole))
      .withColumn("__tot_kept", sum(col("tokens_kept")).over(whole))
      .select(
        col("group"),
        col("docs_before"), col("docs_kept"),
        (col("docs_before") - col("docs_kept")).as("docs_removed"),
        col("tokens_before"), col("tokens_kept"),
        (col("tokens_before") - col("tokens_kept")).as("tokens_removed"),
        (col("docs_kept").cast("double") / col("docs_before"))
          .as("doc_keep_rate"),
        when(col("tokens_before") > 0,
          col("tokens_kept").cast("double") / col("tokens_before"))
          .as("token_keep_rate"),
        when(col("__tot_before") > 0,
          col("tokens_before").cast("double") / col("__tot_before"))
          .as("share_before"),
        when(col("__tot_kept") > 0,
          col("tokens_kept").cast("double") / col("__tot_kept"))
          .as("share_after"),
        (coalesce(when(col("__tot_kept") > 0,
          col("tokens_kept").cast("double") / col("__tot_kept")), lit(0.0)) -
          coalesce(when(col("__tot_before") > 0,
            col("tokens_before").cast("double") / col("__tot_before")), lit(0.0)))
          .as("share_delta"))
      .orderBy(col("group"))
  }

  def drift(before: DataFrame, after: DataFrame, cols: Seq[String]): DataFrame = {
    val b = profile(before, cols.filter(before.columns.contains))
      .withColumnsRenamed(Map("n_rows" -> "rows_before", "n_nulls" -> "nulls_before",
        "n_distinct" -> "distinct_before", "min_value" -> "min_before",
        "max_value" -> "max_before"))
    val a = profile(after, cols.filter(after.columns.contains))
      .withColumnsRenamed(Map("n_rows" -> "rows_after", "n_nulls" -> "nulls_after",
        "n_distinct" -> "distinct_after", "min_value" -> "min_after",
        "max_value" -> "max_after"))
    b.join(a, Seq("column"), "full_outer")
      .withColumn("null_rate_delta",
        coalesce(col("nulls_after").cast("double") / col("rows_after"), lit(0.0)) -
          coalesce(col("nulls_before").cast("double") / col("rows_before"), lit(0.0)))
  }
}
