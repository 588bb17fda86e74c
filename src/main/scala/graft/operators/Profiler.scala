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

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def distinctAgg(v: Column): Column =
      if (exact) countDistinct(v) else approx_count_distinct(v)
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        distinctAgg(col(c)).cast("bigint").as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__nulls_$c`, `__distinct_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    row.selectExpr("__rows",
        s"stack(${cols.size}, $stackArgs) AS (column, n_nulls, n_distinct, min_value, max_value)")
      .select(col("column"), col("__rows").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Drift report between two snapshots of the same logical dataset:
    * per-column null-rate and distinct-count deltas plus min/max changes —
    * the cheap early-warning signal that an upstream extractor changed
    * (a field going 0.1% -> 40% null is a broken parser, not data).
    * Columns present in only one side are reported with nulls on the
    * other, so schema drift is visible in the same frame.
    */
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
