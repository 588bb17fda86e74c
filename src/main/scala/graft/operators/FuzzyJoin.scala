package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-string (edit-distance) similarity join — entity resolution /
  * near-duplicate short-string matching (titles, names, URLs) at corpus
  * scale.
  *
  * The naive formulation is an all-pairs cross join — quadratic and dead at
  * any real size. Two lossless filters compose here:
  *
  *   - LENGTH: every edit changes a string's length by at most 1, so
  *     `edit(a,b) <= d  =>  |len(a)-len(b)| <= d`.
  *   - SEGMENTS (PassJoin, Li et al., ICDE'11): partition the right string
  *     into `d+1` contiguous segments. `d` edits cannot touch all `d+1` of
  *     them (pigeonhole), so the left string must contain at least one
  *     segment EXACTLY, and an alignment displaced by more than `d`
  *     positions would itself cost more than `d` edits — the matching
  *     occurrence starts within `±d` of the segment's home position.
  *
  * The segment filter is what makes the join scale: candidates must share an
  * exact `(right-length, segment-index, segment-string)` key — a selective
  * equi-join key Catalyst shuffles like any other — instead of merely having
  * similar lengths (on a corpus of single words, length alone prunes almost
  * nothing). The left side explodes into at most
  * `(2d+1) lengths × (d+1) segments × (2d+1) starts` probe substrings — a
  * bounded, narrow generate with no shuffle — and surviving candidates are
  * verified once with Spark's thresholded `levenshtein(l, r, d)`, the banded
  * O(d·n) DP that bails out early.
  *
  * Right strings shorter than `d+1` characters have no non-empty segment
  * partition; those pairs route through a residual length-band join whose
  * both sides are degenerate-short by construction.
  */
object FuzzyJoin {

  /** All `(id_l, id_r, dist)` with `levenshtein(s_l, s_r) <= maxDist`.
    * Exact — both blocking filters are provably complete (see class doc).
    */
  def editDistanceJoin(left: DataFrame, leftId: Column, leftStr: Column,
      right: DataFrame, rightId: Column, rightStr: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val d = maxDist
    val l0 = left.select(leftId.as("id_l"), leftStr.as("s_l"))
    val r0 = right.select(rightId.as("id_r"), rightStr.as("s_r"))
    if (d == 0) // degenerate: plain equi join — widening would only add two
      return l0.join(r0, col("s_l") === col("s_r")) // exchanges before a join
        .select(col("id_l"), col("id_r"), lit(0L).as("dist")) // that shuffles anyway
    // widen single-row-group scans BEFORE the segment/substring explosion —
    // the operator's expensive narrow work (identity at scale, see Fanout)
    val l = graft.core.Fanout.spread(l0)
    val r = graft.core.Fanout.spread(r0)

    // ---- segment path: right strings long enough to have d+1 non-empty
    // segments. Segment scheme (deterministic, both sides re-derive it from
    // the length alone): with L = m*(d+1) + k, the first d+1-k segments have
    // length m, the last k have length m+1.
    def segLen(L: Column, i: Column) =
      (L.cast("int") / (d + 1)).cast("int") + when(i >= lit(d + 1) - pmod(L, lit(d + 1)), 1).otherwise(0)
    def segStart(L: Column, i: Column) = // 1-indexed
      i * (L.cast("int") / (d + 1)).cast("int") + greatest(lit(0), i - (lit(d + 1) - pmod(L, lit(d + 1)))) + 1

    val rhsSeg = r.withColumn("__L", length(col("s_r")))
      .where(col("__L") >= d + 1)
      .withColumn("__i", explode(array((0 to d).map(lit(_)): _*)))
      .withColumn("__key", col("s_r").substr(segStart(col("__L"), col("__i")),
        segLen(col("__L"), col("__i"))))

    val lhsSeg = l.withColumn("__l", length(col("s_l")))
      .withColumn("__L", explode(array((-d to d).map(dd => length(col("s_l")) + dd): _*)))
      .where(col("__L") >= d + 1)
      .withColumn("__i", explode(array((0 to d).map(lit(_)): _*)))
      .withColumn("__len", segLen(col("__L"), col("__i")))
      .withColumn("__lo", greatest(lit(1), segStart(col("__L"), col("__i")) - d))
      .withColumn("__hi", least(col("__l") - col("__len") + 1,
        segStart(col("__L"), col("__i")) + d))
      // sequence() direction-infers its step: guard ascending-only
      .withColumn("__st", explode(when(col("__lo") <= col("__hi"),
        sequence(col("__lo"), col("__hi"))).otherwise(array().cast("array<int>"))))
      .withColumn("__key", col("s_l").substr(col("__st"), col("__len")))
      .select(col("id_l"), col("s_l"), col("__L"), col("__i"), col("__key"))

    val segCandidates = lhsSeg.join(rhsSeg, Seq("__L", "__i", "__key"))
      .select(col("id_l"), col("s_l"), col("id_r"), col("s_r"))
      .distinct() // a pair can match on several segments

    // ---- residual path: right strings of length <= d. Their partners have
    // length <= 2d, so BOTH sides of this band join are degenerate-short.
    val bandCandidates = l.where(length(col("s_l")) <= 2 * d)
      .crossJoin(r.where(length(col("s_r")) <= d))
      .where(abs(length(col("s_l")) - length(col("s_r"))) <= d)

    // the two paths partition the pair space on len(s_r): no dedup needed
    segCandidates.unionByName(bandCandidates.select("id_l", "s_l", "id_r", "s_r"))
      .withColumn("__dist", levenshtein(col("s_l"), col("s_r"), d))
      .where(col("__dist") >= 0 && col("__dist") <= d)
      .select(col("id_l"), col("id_r"), col("__dist").cast("bigint").as("dist"))
  }
}
