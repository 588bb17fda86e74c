package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def estimates(df: org.apache.spark.sql.DataFrame, depth: Int, width: Int) = {
    val sk = CountMin.sketch(df, col("k"), depth, width)
    CountMin.estimate(sk, df, col("k"), depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def exact(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("wide sketch recovers exact counts (no collisions at this size)") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    assert(estimates(df, 4, 4096) == exact(df))
  }

  test("never undercounts, even under forced collisions") {
    val df = (1 to 200).map(i => s"k${i % 37}").toDF("k")
    val ex = exact(df)
    val est = estimates(df, depth = 2, width = 4) // 37 keys into 4 buckets
    ex.foreach { case (k, c) =>
      assert(est(k) >= c, s"undercount for $k: ${est(k)} < $c")
    }
  }

  test("deeper sketches only tighten estimates") {
    val df = (1 to 500).map(i => s"k${i % 61}").toDF("k")
    val shallow = estimates(df, depth = 1, width = 16)
    val deep = estimates(df, depth = 6, width = 16)
    shallow.keys.foreach { k => assert(deep(k) <= shallow(k)) }
  }

  test("mergeable: sketch of a union equals the cellwise sum of part sketches") {
    val a = (1 to 100).map(i => s"k${i % 11}").toDF("k")
    val b = (1 to 80).map(i => s"k${i % 7}").toDF("k")
    val whole = CountMin.sketch(a.union(b), col("k"), 3, 32)
    val merged = CountMin.sketch(a, col("k"), 3, 32)
      .union(CountMin.sketch(b, col("k"), 3, 32))
      .groupBy("row", "bucket").agg(sum("c").cast("bigint").as("c"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("estimate joins a broadcast sketch: the corpus side never shuffles for it") {
    val df = (1 to 50).map(i => s"k$i").toDF("k")
    val sk = CountMin.sketch(df, col("k"), 2, 64)
    val plan = CountMin.estimate(sk, df, col("k"), 2, 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }
}
