package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // Three well-separated blobs in 4-d: cluster recovery must be exact.
  private def blobs = {
    val centers = Seq(
      Array(0.0, 0.0, 0.0, 0.0),
      Array(10.0, 10.0, 0.0, 0.0),
      Array(0.0, 10.0, 10.0, 10.0))
    (0L until 90L).map { i =>
      val c = centers((i % 3).toInt)
      // deterministic "noise" in [-0.4, 0.4] — far below the blob gap
      val eps = Array.tabulate(4)(j => ((i * 7 + j * 13) % 9 - 4) / 10.0)
      (i, c.zip(eps).map { case (a, b) => a + b }.toSeq)
    }.toDF("id", "vec")
  }

  test("recovers planted blobs exactly and reaches a fixed point") {
    val (assigned, model) = Clustering.kmeans(blobs, $"id", $"vec", k = 3, maxIters = 10)
    val rows = assigned.collect().map(r => r.getLong(0) -> r.getLong(1))
    // same blob -> same cluster, different blob -> different cluster
    val byBlob = rows.groupBy(_._1 % 3).map { case (b, xs) => b -> xs.map(_._2).toSet }
    assert(byBlob.values.forall(_.size == 1), s"blob split across clusters: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3, "blobs merged")
    // Lloyd's invariants
    val inertia = model.inertia
    assert(inertia.zip(inertia.tail).forall { case (a, b) => b.compareTo(a) <= 0 },
      s"inertia must be monotone: $inertia")
    assert(model.iters < 10, "well-separated blobs must converge early")
  }

  test("fully deterministic: repartitioned input gives identical centroids") {
    val (_, m1) = Clustering.kmeans(blobs, $"id", $"vec", k = 3, maxIters = 5)
    val (_, m2) = Clustering.kmeans(blobs.repartition(13), $"id", $"vec", k = 3, maxIters = 5)
    assert(m1.centroids.length == m2.centroids.length)
    m1.centroids.zip(m2.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b), "centroid drift across partitionings")
    }
    assert(m1.inertia == m2.inertia)
  }

  test("assign is a pure function of the centroids (first-index tie break)") {
    val pts = Seq((1L, Seq(5.0, 0.0))).toDF("id", "vec")
    // equidistant centroids: the FIRST must win, deterministically
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0))
    val got = Clustering.assign(pts, $"id", $"vec", cents).collect()
    assert(got.head.getLong(1) == 0L)
    assert(got.head.getDouble(2) == 25.0)
  }

  test("empty cluster keeps its previous centroid instead of crashing") {
    // 4 identical points, k = 2: one seed duplicates, its cluster empties
    val pts = (1L to 4L).map(i => (i, Seq(1.0, 1.0))).toDF("id", "vec")
    val (assigned, model) = Clustering.kmeans(pts, $"id", $"vec", k = 2, maxIters = 3)
    assert(model.centroids.length == 2)
    assert(assigned.select(countDistinct($"cluster")).head().getLong(0) == 1L)
  }
}
