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
