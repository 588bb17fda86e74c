package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("TopKPerKey matches the window row_number formulation") {
    val orders = Tables.orders(spark, sf0001)
      // unique score so the result set is deterministic on both paths
      .withColumn("score", $"o_totalprice" * 1000000.0 + $"o_orderkey")
    val viaPlan = TopKPerKey(orders, Seq("o_custkey"), "score", 3)
      .select($"o_custkey", $"o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy($"o_custkey").orderBy($"score".desc)
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPlan == viaWindow)
    assert(viaPlan.nonEmpty)
  }

  test("physical plan shows TopKPerKeyExec and no Sort") {
    val orders = Tables.orders(spark, sf0001)
      .withColumn("score", $"o_totalprice" * 1000000.0 + $"o_orderkey")
    val plan = TopKPerKey(orders, Seq("o_custkey"), "score", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), s"unexpected sort in:\n$plan")
  }

  test("k larger than group size returns whole groups") {
    val df = Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)).toDF("k", "score")
    val got = TopKPerKey(df, Seq("k"), "score", 10).count()
    assert(got == 3)
  }
}
