package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, sf0001).select($"l_orderkey", $"l_partkey", $"l_quantity")
    val orders = Tables.orders(spark, sf0001)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    val plain = li.join(orders, Seq("l_orderkey"))
    val salted = SkewJoin.salted(li, orders, "l_orderkey", salt = 8, saltFrom = "l_partkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed partition at runtime (the no-salt fallback path)") {
    // manual salting (above) is the deterministic fix; this pins that the
    // AQE skew-join escape hatch also engages on this build — a hot key
    // whose partition dwarfs the median must be marked skew=true in the
    // final adaptive plan instead of bottlenecking one task
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on ONE key vs 2k spread over 2000 keys
      val left = spark.range(0, 200000).select(lit(7L).as("k"), $"id".as("payload"))
        .union(spark.range(0, 2000).select(($"id" % 2000).as("k"), $"id".as("payload")))
      val right = spark.range(0, 2000).toDF("k")
      val joined = left.join(right, "k")
      // collect() drives THIS DataFrame's QueryExecution, so the adaptive
      // plan below is the final one (a write action would plan separately)
      assert(joined.count() + joined.collect().length == 404000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1500))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("embeddingNearDups agrees with pairwise cosine recomputation") {
    val emb = Tables.embeddings(spark, sf0001).filter($"vec_id" < 60)
    val pairs = Similarity.embeddingNearDups(emb, "vec_id", "embedding", "label", -1.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val rows = emb.select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    for {
      (ia, va, la) <- rows; (ib, vb, lb) <- rows
      if ia < ib && la == lb
    } {
      val dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(va.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(vb.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(pairs((ia, ib)) - dot / (na * nb)) < 1e-9)
    }
  }
}
