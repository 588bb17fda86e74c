package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Unblocked reference: all pairs, plain levenshtein filter. */
  private def allPairs(l: DataFrame, r: DataFrame, d: Int): Set[(Long, Long, Long)] =
    l.crossJoin(r)
      .where(levenshtein($"s_l", $"s_r") <= d)
      .select($"id_l", $"id_r", levenshtein($"s_l", $"s_r").cast("bigint"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

  // Strings engineered to cross length-bucket boundaries: lengths 1..40,
  // with planted near-pairs exactly at bucket edges.
  private val words = (1L to 120L).map { i =>
    val base = ("abcdefghij" * 4).take(1 + (i % 40).toInt)
    val s = if (i % 3 == 0) base.drop(1) // deletion variant
    else if (i % 3 == 1) base + "Z" // insertion variant
    else base
    (i, s)
  }

  test("length-band blocking is complete: blocked join == all-pairs join") {
    for (d <- Seq(0, 1, 2, 3)) {
      val left = words.toDF("id_l", "s_l")
      val right = words.toDF("id_r", "s_r")
      val got = FuzzyJoin.editDistanceJoin(
        left, $"id_l", $"s_l", right, $"id_r", $"s_r", d)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      val want = allPairs(left, right, d)
      assert(got == want, s"maxDist=$d: blocked=${got.size} exact=${want.size}")
    }
  }

  test("no duplicate candidate pairs from the 3-bucket probe explode") {
    val left = words.toDF("id_l", "s_l")
    val right = words.toDF("id_r", "s_r")
    val got = FuzzyJoin.editDistanceJoin(left, $"id_l", $"s_l", right, $"id_r", $"s_r", 2)
    assert(got.count() == got.distinct().count())
  }

  test("emitted distances are the true distances and within the bound") {
    val left = Seq((1L, "kitten")).toDF("id_l", "s_l")
    val right = Seq((10L, "kitten"), (11L, "sitten"), (12L, "sittin"),
      (13L, "sitting"), (14L, "mittens")).toDF("id_r", "s_r")
    val got = FuzzyJoin.editDistanceJoin(left, $"id_l", $"s_l", right, $"id_r", $"s_r", 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // kitten->sitting is distance 3: excluded; the rest are the DP classics
    assert(got == Map(10L -> 0L, 11L -> 1L, 12L -> 2L, 14L -> 2L), s"$got")
  }
}
