package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Curriculum bucketing: assign every document to a quantile bucket of a
  * difficulty/quality score — the partitioning step behind curriculum
  * training schedules ("easy epochs first"), quality-stratified sampling,
  * and per-bucket mixture weights.
  *
  * The obvious formulation (`ntile` over a global ORDER BY) funnels the
  * whole table through one window partition — the same skew wall
  * `packSequences` avoids. This one derives the `n-1` interior cut points
  * as EXACT ORDER STATISTICS — the sorted value at integer rank
  * `(n-1)*i/nBuckets` (floor division) — via a range-partitioned sort of
  * the bare score column plus a rank lookup, and assigns buckets with a
  * narrow literal-array projection: bucket = number of cut points strictly
  * below the score, so ties land in the lower bucket, deterministically.
  *
  * Order statistics instead of interpolated percentiles is a deliberate
  * cross-engine-parity choice: a selected element is a value BOTH engines
  * already store bit-identically, whereas linear interpolation
  * (`lo + (hi-lo)*f` vs `lo*(1-f) + hi*f`) can differ in the last ulp
  * between engines, silently flipping the strict `<` when a cut lands on a
  * data value. Selection has no arithmetic to disagree on. It is also the
  * contract `percentile_approx` keeps (the GK sketch returns actual
  * elements), so the 100 TB swap — replace the exact sort with
  * `approx_percentile` — changes cut placement only, never the assignment
  * semantics. The sort itself is a range-partitioned shuffle of one
  * 8-byte column (no single-partition window anywhere); driver state is
  * `nBuckets-1` doubles.
  */
object Curriculum {

  /** Adds `bucket` (0-based, `nBuckets` values) assigned by exact interior
    * quantile order statistics of `scoreCol`. Rows with a null OR NaN score
    * get bucket null — `na.drop` already excludes NaN from the cut-point
    * computation, so letting NaN rows fall through the assignment expression
    * would silently give them bucket 0 (zero cuts compare strictly below
    * NaN). Unordered scores have no quantile; null says so. Runs two narrow
    * jobs eagerly (count + sorted rank scan) to materialize the cut points.
    */
  def bucketBy(df: DataFrame, scoreCol: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 buckets, got $nBuckets")
    val scores = df.select(scoreCol.cast("double").as("__s")).na.drop
    val sorted = scores.orderBy(col("__s")).rdd.map(_.getDouble(0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = sorted.count()
    // Integer rank arithmetic (no floating-point `q*(n-1)` that could round
    // across an index boundary): cut i sits at 0-based rank (n-1)*i/nBuckets.
    val ranks = (1 until nBuckets).map(i => (n - 1) * i / nBuckets)
    val cuts: Seq[Double] =
      if (n == 0) Seq.empty
      else {
        val rankSet = ranks.toSet
        val found = sorted.zipWithIndex()
          .filter { case (_, r) => rankSet.contains(r) }
          .map(_.swap).collectAsMap()
        ranks.map(found)
      }
    sorted.unpersist(blocking = false)
    // Literal cut array: constant-folded into the codegen'd projection —
    // cheaper than the broadcast crossJoin a computed-cuts frame would need.
    val assigned =
      if (cuts.isEmpty) lit(0L) // no non-null scores -> single bucket
      else size(filter(array(cuts.map(lit): _*), c => c < scoreCol)).cast("bigint")
    df.withColumn("bucket",
      when(scoreCol.isNull || isnan(scoreCol.cast("double")), lit(null).cast("bigint"))
        .otherwise(assigned))
  }
}
