package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASYMMETRIC containment join: find (A, B) pairs with
  * `|A ∩ B| / |A| >= tau` — "most of document A's shingles appear inside
  * B". This is the quote-inclusion / subset-duplicate detector: a press
  * release pasted into a longer article has containment ~1 in that
  * direction while its Jaccard similarity (the t09/t23 PPJoin surface)
  * stays low because B is much bigger. Both directions are reported
  * independently.
  *
  * Blocking is the containment form of the prefix filter: if
  * `|A ∩ B| >= ceil(tau*|A|)` then among ANY `|A| - ceil(tau*|A|) + 1`
  * elements of A at least one lies in B — so candidate pairs only need to
  * form where B contains one of A's `|A| - ceil(tau*|A|) + 1` RAREST
  * shingles (global frequency order, rarest first, deterministic (df,
  * token) tiebreak). Common-shingle fan-out never happens: hot shingles
  * sit at the end of every prefix order. No all-pairs path exists.
  *
  * The threshold is a RATIONAL `tauNum/tauDen` and every comparison is
  * exact integer arithmetic (`inter * tauDen >= tauNum * szA`,
  * `ceil(tau*n) = (tauNum*n + tauDen - 1) div tauDen`) — no float
  * boundary, bit-identical across engines; the reported containment is
  * one final IEEE division.
  *
  * Scale shape: shingles shuffle by value twice (frequency count,
  * candidate join); the per-doc rank window is doc-bounded; the exact
  * verification joins sorted shingle ARRAYS onto the pruned candidates
  * only.
  */
object ContainmentJoin {

  /** `df` must provide a unique id and an array-of-shingles column.
    * Output: (a, b, inter, sz_a, containment) for every ordered pair with
    * containment(A in B) >= tauNum/tauDen; empty shingle sets never pair.
    */
  def containmentJoin(df: DataFrame, idCol: Column, setCol: Column,
      tauNum: Int, tauDen: Int): DataFrame = {
    require(tauDen > 0 && tauNum > 0 && tauNum <= tauDen,
      s"tau must be a rational in (0, 1], got $tauNum/$tauDen")
    // materialize the per-doc shingle sets ONCE: the relation feeds five
    // consumers (frequency table, sizes, prefix ranking, candidate build,
    // exact verification) and without this the scan + shingle construction
    // replays for each of them (7 parquet scans in the unchecked plan)
    val base = df.select(idCol.as("id"),
      array_sort(array_distinct(setCol)).as("ts"))
      .localCheckpoint()
    // set size is the array length — carrying it on the explode removes the
    // groupBy(id) aggregation and BOTH id-keyed joins the previous shape
    // paid to re-attach it (3 exchanges gone from the plan)
    val tok = base.select(col("id"), size(col("ts")).as("sz"),
      explode(col("ts")).as("w"))
    val dfreq = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // rarest-first prefix of each set: |A| - ceil(tau*|A|) + 1 elements
    val prefixLen = (col("sz") -
      call_function("div",
        col("sz") * tauNum + (tauDen - 1), lit(tauDen.toLong))) + 1
    val ranked = tok.join(dfreq, "w")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("w"))))
      .where(col("rk") <= prefixLen)
      .select(col("id").as("a"), col("w"), col("sz").as("sz_a"))
    // candidates: B contains one of A's prefix shingles AND is big enough
    // to possibly satisfy the threshold (|A∩B| <= |B|, so tauDen*|B| >=
    // tauNum*|A| is necessary) — the size filter runs before the distinct
    val tokB = tok
      .select(col("id").as("b"), col("w"), col("sz").as("sz_b"))
    val cand = ranked.join(tokB, "w")
      .where(col("a") =!= col("b") &&
        col("sz_b") * tauDen >= col("sz_a") * tauNum)
      .select(col("a"), col("b")).distinct()
    // exact verification on the pruned pairs only
    val arrs = base
    cand
      .join(arrs.select(col("id").as("a"), col("ts").as("ta")), "a")
      .join(arrs.select(col("id").as("b"), col("ts").as("tb")), "b")
      .select(col("a"), col("b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
        size(col("ta")).cast("long").as("sz_a"))
      .where(col("inter") * tauDen >= lit(tauNum.toLong) * col("sz_a"))
      .withColumn("containment", col("inter").cast("double") / col("sz_a"))
  }
}
