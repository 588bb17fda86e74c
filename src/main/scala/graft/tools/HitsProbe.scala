package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway timing probe for the t89 gate cost breakdown. */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
    val m = $"doc_id" % 47
    val e1 = docs.select(
      concat(lit("h"), ($"doc_id" % 50).cast("string")).as("src"),
      concat(lit("h"), ((m * m + 3) % 47).cast("string")).as("dst"))
    val e2 = docs.select(
      concat(lit("h"), ($"doc_id" % 50).cast("string")).as("src"),
      concat(lit("h"), ((m * m * m + 11) % 47).cast("string")).as("dst"))
    val edges = e1.union(e2)
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val r1 = time("run1 iters=3 deltas") {
      graft.operators.Hits.hits(edges, $"src", $"dst", iters = 3)
    }
    val r2 = time("run2 iters=3 nodeltas repart") {
      graft.operators.Hits.hits(edges.repartition(7), $"src", $"dst",
        iters = 3, trackDeltas = false)
    }
    time("identity check") {
      r1.scores.exceptAll(r2.scores).count() + r2.scores.exceptAll(r1.scores).count()
    }
    time("mass + nonneg") {
      r1.scores.agg(sum($"hub"), sum($"auth")).collect()
      r1.scores.where($"hub" < 0 || $"auth" < 0).count()
    }
    time("run3 again warm") {
      graft.operators.Hits.hits(edges, $"src", $"dst", iters = 3)
    }
    spark.stop()
  }
}
