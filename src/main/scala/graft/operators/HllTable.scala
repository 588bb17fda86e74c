package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable per-group HLL register tables — incremental distinct counting
  * as DATA, not as a query: a profile pipeline sketches each corpus drop
  * once, stores the per-group registers, and answers "distinct
  * fingerprints per source, over any union of drops" by max-merging
  * registers — never rescanning history. (q22 answers one approx-distinct
  * question; this materializes the reusable state behind all of them.)
  *
  * Deliberately CLASSIC HyperLogLog over an md5-derived hash rather than a
  * wrapper around `hll_sketch_agg`: the DataSketches sketches carry a HIP
  * estimator whose value depends on insertion order, so two merge paths
  * over the same data report different numbers (measured: 854 vs 840) —
  * unacceptable under this repo's determinism bar. Plain registers have
  * none of that:
  *
  *   - the register table is a pure max-aggregation — partition- and
  *     merge-order-invariant, `sketch(A ∪ B)` IDENTICAL to
  *     `merge(sketch(A), sketch(B))` row-for-row;
  *   - the hash is `md5` hex arithmetic (house t41/t48 convention), so the
  *     t70 oracle recomputes every register bit-identically in DuckDB —
  *     the sketch itself is hash-gated, not just tolerance-gated;
  *   - estimation (the only floating step) is tolerance-gated in t71.
  *
  * Layout: p = 10 → m = 1024 registers/group (≈3.25 % standard error),
  * rho from the next 50 hash bits. Scale shape: one partially-aggregated
  * groupBy per drop; the stored table is ≤ m rows per group; merging two
  * tables is a max-aggregation over (group, bucket) — buffers, never data.
  */
object HllTable {

  val P = 10
  val M: Int = 1 << P // 1024 registers

  /** 60-bit md5-derived hash (15 hex digits — positive in a long). */
  private def h60(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10).cast("bigint")

  /** Per-row HLL observable `(group, bucket, rho)` — the pure projection
    * that [[build]] max-aggregates. Exposed so the streaming twin
    * ([[graft.streaming.StreamingOps.hllStream]]) shares the exact hash
    * arithmetic with the batch path.
    */
  def observations(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val h = h60(valueCol)
    val w = floor(h / M).cast("bigint")
    // bin() prints without leading zeros in Spark AND DuckDB, so
    // 51 - length(bin(w)) counts the leading zeros of the 50-bit window
    val rho = when(w === 0, lit(51))
      .otherwise(lit(51) - length(bin(w))).cast("bigint")
    df.select(groupCol.as("group"), pmod(h, lit(M)).as("bucket"), rho.as("rho"))
  }

  /** Per-group register table: `DataFrame[group, bucket, rho]` with
    * `rho` = 1 + leading zeros of the 50 post-bucket hash bits (the classic
    * HLL observable), max-aggregated per bucket.
    */
  def build(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame =
    observations(df, groupCol, valueCol)
      .groupBy(col("group"), col("bucket"))
      .agg(max(col("rho")).as("rho"))

  /** Merge two register tables: max per (group, bucket). Exact — the merged
    * table is row-identical to sketching the unioned data directly.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("group"), col("bucket"))
      .agg(max(col("rho")).as("rho"))

  /** Estimates per group: `DataFrame[group, estimate]` — the standard HLL
    * harmonic-mean estimator with the linear-counting small-range
    * correction. Floating arithmetic lives ONLY here (registers stay
    * exact); accuracy is gate-checked in t71.
    */
  def estimates(table: DataFrame): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    table.groupBy(col("group"))
      .agg(
        count(lit(1)).as("__filled"),
        sum(pow(lit(2.0), -col("rho"))).as("__inv"))
      .withColumn("__zeros", lit(M) - col("__filled"))
      .withColumn("__raw",
        lit(alpha * M * M) / (col("__inv") + col("__zeros").cast("double")))
      .withColumn("estimate",
        when(col("__raw") <= 2.5 * M && col("__zeros") > 0,
          round(lit(M.toDouble) * log(lit(M.toDouble) / col("__zeros"))))
          .otherwise(round(col("__raw"))).cast("bigint"))
      .select(col("group"), col("estimate"))
  }
}
