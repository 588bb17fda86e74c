package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("an outright majority item always survives with a near-exact count") {
    // 600 of 'a', 400 spread over 100 other items, k = 9
    val items = Seq.fill(600)("a") ++ (1 to 400).map(i => s"x${i % 100}")
    val df = spark.createDataset(items).toDF("item").repartition(8)
    val got = HeavyHitters.frequentItems(df, "item", k = 9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.contains("a"), got.toString)
    val n = items.size
    assert(got("a") <= 600L && 600L - got("a") <= n / 10, got("a").toString)
  }

  test("guarantees hold on skewed data across many partitions and merge orders") {
    val k = 19
    // Zipf-ish: item i appears 2000/i times
    val items = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
    val n = items.size.toLong
    val df = spark.createDataset(scala.util.Random.shuffle(items)).toDF("item").repartition(16)
    val got = HeavyHitters.frequentItems(df, "item", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= k)
    val exact = items.groupBy(identity).map { case (x, xs) => x -> xs.size.toLong }
    val thresh = n.toDouble / (k + 1)
    exact.foreach { case (x, c) =>
      if (c > thresh) assert(got.contains(x), s"$x true=$c thresh=$thresh missing")
    }
    got.foreach { case (x, est) =>
      val c = exact(x)
      assert(est <= c, s"$x overcounted: est=$est true=$c")
      assert(c - est <= thresh, s"$x undercount too big: est=$est true=$c")
    }
  }

  test("null and non-string inputs are handled (cast + drop)") {
    val df = Seq(Some(1), Some(1), Some(2), None).toDF("item")
    val got = HeavyHitters.frequentItems(df, "item", k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("1" -> 2L, "2" -> 1L))
  }
}
