package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("weight matrix is a pure function of the seed with Achlioptas marginals") {
    val a = Projection.sparseWeights(64, 8)
    val b = Projection.sparseWeights(64, 8)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(w => w == -1 || w == 0 || w == 1))
    val nz = a.flatten.count(_ != 0)
    // E[nonzero] = 512/3 ≈ 171; allow a wide deterministic band
    assert(nz > 100 && nz < 240, s"nonzero count $nz")
    assert(Projection.sparseWeights(64, 8, "other").flatten.toSeq != a.flatten.toSeq)
  }

  test("projection matches a hand-computed fold on exact integer vectors") {
    val w = Array(Array(1, -1, 0), Array(0, 1, 1))
    val df = Seq(Tuple1(Seq(2.0f, 3.0f, 5.0f))).toDF("v")
    val got = df.select(Projection.project($"v", w): _*).collect()(0)
    assert(got.getDouble(0) == 2.0 - 3.0)
    assert(got.getDouble(1) == 3.0 + 5.0)
  }

  test("projection is linear on integer-exact vectors") {
    val w = Projection.sparseWeights(8, 4)
    val a = Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)
    val b = Seq(8f, 7f, 6f, 5f, 4f, 3f, 2f, 1f)
    val df = Seq((a, b, a.zip(b).map { case (x, y) => x + y }))
      .toDF("a", "b", "ab")
    val r = df.select(
      (Projection.project($"a", w) ++ Projection.project($"b", w) ++
        Projection.project($"ab", w)): _*).collect()(0)
    for (j <- 0 until 4)
      assert(r.getDouble(j) + r.getDouble(4 + j) == r.getDouble(8 + j))
  }

  test("JL distortion on the real embeddings is sane at k=16") {
    val w = Projection.sparseWeights(64, 16)
    val vecs = graft.core.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").limit(40)
      .select($"vec_id" +: Projection.project($"embedding", w): _*)
      .collect()
      .map(r => (0 until 16).map(j => r.getDouble(1 + j)))
    val orig = graft.core.Tables.embeddings(spark, sf0001)
      .select($"embedding").limit(40).collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    // median distortion of projected vs (3/k)-scaled true squared distance
    val ratios = for {
      i <- orig.indices; j <- orig.indices if i < j
      d0 = Projection.sq(orig(i), orig(j)) if d0 > 0
    } yield Projection.sq(vecs(i), vecs(j)) / ((16.0 / 3.0) * d0)
    val med = ratios.sorted.apply(ratios.size / 2)
    assert(med > 0.5 && med < 2.0, s"median distortion $med")
  }
}
