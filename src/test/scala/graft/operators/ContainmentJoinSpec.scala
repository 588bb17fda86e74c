package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContainmentJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, Seq[String])], num: Int, den: Int) =
    ContainmentJoin.containmentJoin(docs.toDF("id", "s"), $"id", $"s", num, den)
      .select("a", "b", "inter", "sz_a").as[(Long, Long, Long, Long)]
      .collect().toSet

  test("asymmetric subset: the quote is contained in the article, not vice versa") {
    val docs = Seq(
      1L -> Seq("a", "b", "c"),                       // the quote
      2L -> Seq("a", "b", "c", "d", "e", "f", "g"))   // the article
    assert(run(docs, 9, 10) == Set((1L, 2L, 3L, 3L)))
  }

  test("threshold boundary is exact rational arithmetic, inclusive") {
    val docs = Seq(
      1L -> Seq("a", "b", "c", "d"), // 2/4 = exactly 1/2 vs doc 3
      3L -> Seq("a", "b", "x", "y", "z"))
    val half = run(docs, 1, 2)
    assert(half.contains((1L, 3L, 2L, 4L)))
    assert(!run(docs, 51, 100).exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("matches the naive all-pairs computation on corpus shingles") {
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select($"doc_id", TextAnalysis.wordShingles($"text", 3).as("sh"))
    val fast = ContainmentJoin.containmentJoin(docs, $"doc_id", $"sh", 1, 2)
      .select("a", "b", "inter").as[(Long, Long, Long)].collect().toSet
    val arrs = docs.select($"doc_id".as("a"), array_sort(array_distinct($"sh")).as("ta"))
    val naive = arrs.crossJoin(
        docs.select($"doc_id".as("b"), array_sort(array_distinct($"sh")).as("tb")))
      .where($"a" =!= $"b" && size($"ta") > 0)
      .select($"a", $"b", size(array_intersect($"ta", $"tb")).cast("long").as("inter"),
        size($"ta").cast("long").as("sz"))
      .where($"inter" * 2 >= $"sz")
      .select("a", "b", "inter").as[(Long, Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("empty sets never pair; identical sets contain each other both ways") {
    val docs = Seq(1L -> Seq.empty[String], 2L -> Seq("x", "y"), 3L -> Seq("y", "x"))
    val got = run(docs, 1, 1)
    assert(got == Set((2L, 3L, 2L, 2L), (3L, 2L, 2L, 2L)))
  }
}
