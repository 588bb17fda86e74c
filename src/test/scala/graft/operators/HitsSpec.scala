package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def score(df: org.apache.spark.sql.DataFrame): Map[String, (BigDecimal, BigDecimal)] =
    df.collect().map(r => r.getString(0) ->
      (BigDecimal(r.getDecimal(1)), BigDecimal(r.getDecimal(2)))).toMap

  test("hand-computed two-iteration fixed point on the 4-node chain") {
    // 1->3, 2->3, 3->4: after two iterations (exact fractions)
    //   auth = (0, 0, 4/5, 1/5), hub = (4/9, 4/9, 1/9, 0)
    val edges = Seq(("1", "3"), ("2", "3"), ("3", "4")).toDF("s", "t")
    val r = Hits.hits(edges, col("s"), col("t"), iters = 2)
    val m = score(r.scores)
    def close(a: BigDecimal, b: BigDecimal): Boolean = (a - b).abs < BigDecimal("1e-8")
    assert(close(m("3")._2, BigDecimal(4) / 5) && close(m("4")._2, BigDecimal(1) / 5))
    assert(close(m("1")._2, 0) && close(m("2")._2, 0))
    assert(close(m("1")._1, BigDecimal(4) / 9) && close(m("2")._1, BigDecimal(4) / 9))
    assert(close(m("3")._1, BigDecimal(1) / 9) && close(m("4")._1, 0))
  }

  test("scores are L1-normalized and repartition-invariant (bit identity)") {
    val edges = spark.range(0, 400).select(
      concat(lit("n"), (col("id") % 20).cast("string")).as("s"),
      concat(lit("n"), ((col("id") * 3 + 1) % 20).cast("string")).as("t"))
    val r1 = Hits.hits(edges, col("s"), col("t"), iters = 4)
    val r2 = Hits.hits(edges.repartition(11), col("s"), col("t"), iters = 4)
    assert(r1.scores.exceptAll(r2.scores).isEmpty &&
      r2.scores.exceptAll(r1.scores).isEmpty)
    val sums = r1.scores.agg(
      sum(col("hub")).cast("decimal(38,18)"),
      sum(col("auth")).cast("decimal(38,18)")).collect()(0)
    assert((BigDecimal(sums.getDecimal(0)) - 1).abs < BigDecimal("1e-8"))
    assert((BigDecimal(sums.getDecimal(1)) - 1).abs < BigDecimal("1e-8"))
  }

  test("a pure hub and a pure authority separate cleanly") {
    // star: h0 links to a1..a3; nothing links to h0, a1..a3 link nowhere
    val edges = Seq(("h0", "a1"), ("h0", "a2"), ("h0", "a3")).toDF("s", "t")
    val m = score(Hits.hits(edges, col("s"), col("t"), iters = 3).scores)
    assert(m("h0")._1 > BigDecimal("0.999") && m("h0")._2 == BigDecimal(0))
    Seq("a1", "a2", "a3").foreach { a =>
      assert(m(a)._1 == BigDecimal(0))
      assert((m(a)._2 - BigDecimal(1) / 3).abs < BigDecimal("1e-8"))
    }
  }

  test("deltas contract after the first iteration") {
    // quadratic dst map -> irregular in-degrees (a linear map mod n is a
    // bijection, making the graph regular and the uniform start already the
    // fixed point with all-zero deltas)
    val edges = spark.range(0, 500).select(
      concat(lit("n"), (col("id") % 25).cast("string")).as("s"),
      concat(lit("n"), ((col("id") * col("id") + 1) % 23).cast("string")).as("t"))
    val r = Hits.hits(edges, col("s"), col("t"), iters = 6)
    def contracting(ds: Seq[BigDecimal]): Boolean =
      ds.drop(1).sliding(2).forall {
        case Seq(x, y) => y <= x
        case _ => true
      }
    assert(r.authDeltas.head > 0, "graph too symmetric: test is vacuous")
    assert(contracting(r.authDeltas), r.authDeltas.toString)
    assert(contracting(r.hubDeltas), r.hubDeltas.toString)
    // and the final delta is far below the first (actual convergence,
    // not just non-increase)
    assert(r.authDeltas.last < r.authDeltas.head / 2)
  }
}
