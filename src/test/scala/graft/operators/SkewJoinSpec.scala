package graft.operators

import graft.SparkSpec
import graft.core.Tables

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
