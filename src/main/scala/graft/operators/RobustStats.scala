package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Robust outlier flagging by median / MAD — the standard "drop the length
  * (or score) outliers" corpus-cleaning step. Mean/stddev break exactly
  * when needed most (the outliers being hunted drag both), so the robust
  * location/scale pair is the production choice.
  *
  * Both statistics are EXACT ORDER STATISTICS at integer rank `(n-1)/2`
  * (the lower median — [[Curriculum.bucketBy]]'s selection-not-
  * interpolation rationale): a selected element is a value both engines
  * already hold bit-identically, deviations `|x - med|` are one correctly-
  * rounded IEEE op each, so the MAD selection sees identical doubles and
  * the flag `|x - med| > k·MAD` is bit-reproducible cross-engine. When
  * MAD = 0 (over half the values identical) the flag degenerates to
  * "differs from the median at all" — the strict `>` keeps exact-equal
  * values in, deterministically.
  *
  * Scale shape: two range-partitioned single-column sorts + rank lookups
  * (no single-partition window anywhere), then a narrow literal projection;
  * driver state is two doubles. The 100 TB swap is `approx_percentile`
  * for both selections — element-returning, so the flag semantics carry
  * over unchanged (cut placement moves, never the comparison rule).
  */
object RobustStats {

  /** The sorted value at 0-based integer rank `(n-1)/2` of a one-column
    * frame of non-null doubles; NaN when empty.
    */
  private def lowerMedian(vals: DataFrame): Double = {
    val sorted = vals.orderBy(col("__s")).rdd.map(_.getDouble(0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = sorted.count()
    val v =
      if (n == 0) Double.NaN
      else {
        val r = (n - 1) / 2
        sorted.zipWithIndex().filter(_._2 == r).map(_._1).first()
      }
    sorted.unpersist(blocking = false)
    v
  }

  /** Adds `robust_med`, `robust_mad` (corpus-constant columns) and
    * `is_outlier` (`|x - med| > k·MAD`; null for null/NaN scores, which are
    * excluded from both selections). Runs two eager narrow jobs.
    */
  def flagOutliers(df: DataFrame, scoreCol: Column, k: Double = 3.0): DataFrame = {
    require(k > 0.0, s"need a positive scale multiple, got $k")
    val s = scoreCol.cast("double")
    val vals = df.select(s.as("__s")).na.drop
    val med = lowerMedian(vals)
    val mad = lowerMedian(vals.select(abs(col("__s") - med).as("__s")))
    df.withColumn("robust_med", lit(med))
      .withColumn("robust_mad", lit(mad))
      .withColumn("is_outlier",
        when(s.isNull || isnan(s), lit(null).cast("boolean"))
          .otherwise(abs(s - lit(med)) > lit(k) * lit(mad)))
  }
}
