package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curriculum bucketing: assign every document to a quantile bucket of a
  * difficulty/quality score — the partitioning step behind curriculum
  * training schedules ("easy epochs first"), quality-stratified sampling,
  * and per-bucket mixture weights.
  *
  * The obvious formulation (`ntile` over a global ORDER BY) funnels the
  * whole table through one window partition — the same skew wall
  * `packSequences` avoids. This one computes the `n-1` interior EXACT
  * percentile cut points in a single aggregation (driver state = n-1
  * doubles), broadcasts them, and assigns buckets with a narrow
  * `array`-scan projection: bucket = number of cut points strictly below
  * the score, so ties land in the lower bucket, deterministically.
  * Exact percentiles keep the operator oracle-comparable; at 100 TB swap
  * `percentile` for `percentile_approx` — the assignment projection and
  * the contract are unchanged except for cut-point placement.
  */
object Curriculum {

  /** Adds `bucket` (0-based, `nBuckets` values) assigned by exact interior
    * quantiles of `scoreCol`. Rows with a null score get bucket null.
    */
  def bucketBy(df: DataFrame, scoreCol: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 buckets, got $nBuckets")
    val fracs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = df.agg(
      percentile(scoreCol, typedLit(fracs)).as("__cuts"))
    df.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(scoreCol.isNull, lit(null).cast("bigint"))
          .otherwise(size(filter(col("__cuts"), c => c < scoreCol)).cast("bigint")))
      .drop("__cuts")
  }
}
