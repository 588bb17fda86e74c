package graft.sinks

import graft.SparkSpec
import graft.core.Tables

import java.nio.file.Files

class DataSinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write produces hive-style dirs and round-trips") {
    val out = Files.createTempDirectory("part_sink").toString + "/docs"
    val docs = Tables.documents(spark, sf0001)
    val back = DataSinks.writePartitioned(docs, out, Seq("lang"))
    assert(back.count() == docs.count())
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")))
    // partition pruning: a lang filter reads only that directory
    val plan = back.filter($"lang" === "en").queryExecution.executedPlan.toString
    assert(!plan.contains("lang=de") || plan.contains("PartitionFilters"))
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("bucket_wh").toString
    DataSinks.writeBucketed(
      Tables.orders(spark, sf0001).select($"o_orderkey", $"o_orderpriority"),
      "b_orders", s"$wh/b_orders", "o_orderkey")
    DataSinks.writeBucketed(
      Tables.lineitem(spark, sf0001)
        .select($"l_orderkey".as("o_orderkey"), $"l_quantity"),
      "b_lineitem", s"$wh/b_lineitem", "o_orderkey")
    // disable broadcast so the planner must consider a sort-merge join — at
    // real scale neither side broadcasts; that is when bucketing pays off
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: no shuffle (hash-partitioning exchange) on either side
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used in:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf0001).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
