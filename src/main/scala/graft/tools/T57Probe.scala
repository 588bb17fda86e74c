package graft.tools

import graft.core.{GraftSession, Tables}
import graft.operators.{Clustering, DedupClusters, Similarity}
import org.apache.spark.sql.functions._

object T57Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(appName = "t57-probe")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, d)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t57] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val vecs = emb.select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val (assigned, _) = t("kmeans fit+assign plan") {
      Clustering.kmeans(vecs, col("id"), col("vec"), 16, 4)
    }
    val clustered = vecs.join(assigned.select($"id", $"cluster"), Seq("id")).cache()
    t("clustered materialize") { clustered.count() }
    val left = clustered.select($"cluster", $"id".as("id_a"), $"vec".as("__va"))
    val right = clustered.select($"cluster", $"id".as("id_b"), $"vec".as("__vb"))
    val pairs = left.join(right, Seq("cluster"))
      .where($"id_a" < $"id_b" &&
        Similarity.cosine($"__va".cast("array<float>"), $"__vb".cast("array<float>")) >= 0.3)
      .select($"id_a", $"id_b").cache()
    t("within-cluster pairs") { pairs.count() }
    val comps = t("components plan+run") {
      val c = DedupClusters.connectedComponentsStars(clustered.select($"id"), pairs, "id")
      c.count(); c
    }
    val res = clustered.select($"id", $"cluster")
      .join(comps, Seq("id"))
      .select($"id", $"cluster", ($"id" === $"component").as("survivor")).cache()
    t("res materialize") { res.count() }
    val sv = res.filter($"survivor")
      .join(emb.select($"vec_id".as("id"), $"embedding"), Seq("id"))
    t("dupPairs check") {
      sv.as("a").join(sv.as("b"),
          col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
        .filter(Similarity.cosine(col("a.embedding"), col("b.embedding")) >= 0.3)
        .count()
    }
    spark.stop()
  }
}
