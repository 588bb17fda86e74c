package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless point-in-interval join via BUCKET BLOCKING.
  *
  * Spark has no native interval-join strategy: a raw
  * `a.join(b, pt >= start && pt <= end)` plans as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side fits a broadcast) — quadratic
  * work that dies long before 100 TB. The classic fix is to quantize time
  * into fixed-width buckets: an interval registers in every bucket it
  * overlaps, a point lives in exactly ONE bucket, and the join becomes a
  * plain shuffled EQUI-join on the bucket id refined by the exact range
  * predicate.
  *
  * Because each point has exactly one bucket and an interval covers any
  * bucket at most once, every qualifying (point, interval) pair emerges
  * exactly once — no post-join dedup. Cost knob: intervals are replicated
  * `len/width + 1` times, so pick `bucketWidth` near the typical interval
  * length (replication stays O(1)) — the degenerate widths (too small =
  * replication blow-up, too large = buckets degenerate to one giant
  * partition) are the documented failure modes, not correctness risks.
  *
  * The complement of [[AsOfJoin]] (nearest predecessor, keyed) and the
  * keyed interval join in streaming's purchaseAttribution (equi-key +
  * range refine): this one needs NO shared key at all.
  */
object IntervalJoin {

  /** Inclusive point-in-interval join. `points` and `intervals` must not
    * share column names; every column of both survives. Rows with null
    * point/bounds drop (no bucket). `end >= start` is assumed (violating
    * rows simply match nothing: their bucket sequence is empty or
    * descending-guarded).
    */
  def pointInInterval(points: DataFrame, ptCol: Column,
      intervals: DataFrame, startCol: Column, endCol: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val pb = points.where(ptCol.isNotNull)
      .withColumn("__bucket", floorDiv(ptCol, bucketWidth))
    val ib = intervals
      .where(startCol.isNotNull && endCol.isNotNull && endCol >= startCol)
      .withColumn("__bucket",
        explode(sequence(floorDiv(startCol, bucketWidth),
          floorDiv(endCol, bucketWidth))))
    pb.join(ib, Seq("__bucket"))
      .where(ptCol >= startCol && ptCol <= endCol)
      .drop("__bucket")
  }

  /** Exact floor division on longs (SQL `//` semantics on negatives).
    * Spark's `/` on longs is DOUBLE division (inexact past 2^53) and `div`
    * truncates toward zero; subtracting the positive modulus first makes
    * the integral divide exact for the whole long range.
    */
  private def floorDiv(c: Column, w: Long): Column = {
    val cl = c.cast("bigint")
    call_function("div", cl - pmod(cl, lit(w)), lit(w))
  }
}
