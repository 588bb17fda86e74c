package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("every row of a group gets the same split (no leakage across the fence)") {
    val df = (1L to 5000L).map(i => (i, s"domain-${i % 97}.org")).toDF("id", "domain")
    val perGroup = df.select($"domain", Splits.assign($"domain", splits).as("split"))
      .groupBy("domain").agg(countDistinct($"split").as("n"))
      .agg(max($"n")).collect()(0).getLong(0)
    assert(perGroup == 1L)
  }

  test("fractions are approximately honored over many groups") {
    val df = (1L to 20000L).map(i => Tuple1(s"g$i")).toDF("g")
    val got = df.select(Splits.assign($"g", splits).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got("train") / 20000.0 - 0.8) < 0.02)
    assert(math.abs(got("val") / 20000.0 - 0.1) < 0.02)
    assert(math.abs(got("test") / 20000.0 - 0.1) < 0.02)
    assert(got.values.sum == 20000L)
  }

  test("assignment is repartition- and corpus-size-invariant (pure key function)") {
    val big = (1L to 1000L).map(i => Tuple1(s"k$i")).toDF("g")
    val small = (1L to 100L).map(i => Tuple1(s"k$i")).toDF("g")
    val a = big.repartition(17).select($"g", Splits.assign($"g", splits).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = small.select($"g", Splits.assign($"g", splits).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(b.forall { case (k, v) => a(k) == v })
  }

  test("degenerate and boundary fractions: zero-width split gets nothing, last absorbs slack") {
    val df = (1L to 500L).map(i => Tuple1(s"x$i")).toDF("g")
    val got = df.select(Splits.assign($"g", Seq("a" -> 0.0, "b" -> 1.0)).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("b" -> 500L))
    intercept[IllegalArgumentException] {
      Splits.assign(lit("k"), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }
}
