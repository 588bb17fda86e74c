package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-string (edit-distance) similarity join — entity resolution /
  * near-duplicate short-string matching (titles, names, URLs) at corpus
  * scale.
  *
  * The naive formulation is an all-pairs cross join — quadratic and dead at
  * any real size. This one blocks on the LENGTH BAND first, which is a
  * lossless filter for Levenshtein distance: every single edit changes a
  * string's length by at most 1, so `edit(a,b) <= d  =>  |len(a)-len(b)| <= d`.
  * With bucket `floor(len / (d+1))`, two strings within distance `d` are at
  * most one bucket apart (their lengths differ by `d < d+1`), so probing
  * buckets `{b-1, b, b+1}` misses nothing — and because each right-side row
  * lives in exactly ONE bucket while the three probe copies carry DISTINCT
  * bucket ids, no candidate pair is generated twice (no dedup pass needed).
  *
  * The verify step uses Spark's thresholded `levenshtein(l, r, d)` — the
  * banded O(d·n) DP that bails out early — so candidate verification cost
  * is linear, not quadratic, in string length. The equi-join on the bucket
  * id is an ordinary shuffle/broadcast hash join Catalyst plans like any
  * other key; length skew (most strings sharing a few lengths) is the
  * documented limit, and composing a second blocking key (e.g. PassJoin
  * segments) multiplies selectivity without losing completeness.
  */
object FuzzyJoin {

  /** All `(id_l, id_r, dist)` with `levenshtein(s_l, s_r) <= maxDist`.
    * Exact — the blocking is provably complete (see class doc).
    */
  def editDistanceJoin(left: DataFrame, leftId: Column, leftStr: Column,
      right: DataFrame, rightId: Column, rightStr: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val w = maxDist + 1
    val probes = left.select(leftId.as("id_l"), leftStr.as("s_l"))
      .withColumn("__bl", expr(s"length(s_l) div $w"))
      .withColumn("__b", explode(array(col("__bl") - 1, col("__bl"), col("__bl") + 1)))
      .drop("__bl")
    val rhs = right.select(rightId.as("id_r"), rightStr.as("s_r"))
      .withColumn("__b", expr(s"length(s_r) div $w"))
    val dist = levenshtein(col("s_l"), col("s_r"), maxDist)
    probes.join(rhs, "__b")
      .where(abs(length(col("s_l")) - length(col("s_r"))) <= maxDist &&
        dist >= 0 && dist <= maxDist)
      .select(col("id_l"), col("id_r"), dist.cast("bigint").as("dist"))
  }
}
