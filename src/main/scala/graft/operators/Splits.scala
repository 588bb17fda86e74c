package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Leakage-safe train/validation/test splitting.
  *
  * The classic corpus-splitting bug is assigning SPLITS PER ROW: near-
  * duplicate documents (same site, same template, same boilerplate) land on
  * both sides of the train/eval fence and the eval set silently measures
  * memorization. The fix every published pipeline converges on is to hash a
  * LEAKAGE GROUP key — registrable domain, cluster id, source shard — so an
  * entire group lands in exactly one split.
  *
  * Assignment is the house keyed-md5 arithmetic (see [[Sampling]]): a pure
  * function of the group key, independent of partitioning, cluster size,
  * row order, and scale factor — the same group maps to the same split at
  * sf0.001 and at 100 TB, and any engine can recompute the assignment. No
  * shuffle: a codegen'd projection per row.
  */
object Splits {

  /** Integer bucket of a key in [0, 2^32): first 8 md5 hex digits. */
  def bucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")

  /** Cumulative-fraction cut points as exact longs over the 2^32 key space
    * (one double multiply per cut, then exact integer compares everywhere —
    * no accumulated floating-point boundary to disagree about).
    */
  def cutPoints(splits: Seq[(String, Double)]): Seq[Long] =
    splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * 4294967296.0).toLong)

  /** Split assignment column: `splits` are (name, fraction) with fractions
    * summing to ~1; the key's integer bucket is matched against cumulative
    * cut points. The LAST split absorbs any rounding slack so the
    * assignment is total (never null for a non-null key).
    */
  def assign(groupKey: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0.0), "fractions must be non-negative")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions must sum to 1, got $total")
    val b = bucket(groupKey)
    val cuts = cutPoints(splits)
    // first cut strictly above the bucket wins; the last name is the floor
    splits.init.zip(cuts.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) => when(b < cut, name).otherwise(rest)
    }
  }
}
