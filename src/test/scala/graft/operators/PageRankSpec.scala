package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(r: PageRank.Result): Map[String, BigDecimal] =
    r.ranks.collect().map(row => row.getString(0) -> BigDecimal(row.getDecimal(1))).toMap

  test("symmetric cycle converges to the uniform distribution immediately") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val r = PageRank.pageRank(e, $"s", $"d", iters = 3)
    val got = ranksOf(r)
    got.values.foreach(v => assert((v - BigDecimal(1) / 3).abs < 1e-15))
    // stationary from the start: every delta is (rounding-level) zero
    r.deltas.foreach(d => assert(d < 1e-15))
  }

  test("hand-computed first iteration with a dangling node") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("s", "d")
    val r = PageRank.pageRank(e, $"s", $"d", iters = 1)
    val got = ranksOf(r)
    // p0 = 1/3; dangling c redistributes .85/9; teleport .05
    // a = .05 + .85/9; b = a + .85/6; c = .05 + .85/9 + .85/2
    assert((got("a") - (BigDecimal("0.05") + BigDecimal("0.85") / 9)).abs < 1e-15)
    assert((got("b") - (BigDecimal("0.05") + BigDecimal("0.85") / 9 + BigDecimal("0.85") / 6)).abs < 1e-15)
    assert((got("c") - (BigDecimal("0.05") + BigDecimal("0.85") / 9 + BigDecimal("0.425"))).abs < 1e-15)
    assert((r.masses.head - 1).abs < 1e-12)
  }

  test("authority ordering, mass conservation, contraction over iterations") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"), ("c", "a")).toDF("s", "d")
    val r = PageRank.pageRank(e, $"s", $"d", iters = 8)
    val got = ranksOf(r)
    assert(got("c") > got("a") && got("c") > got("b") && got("c") > got("d"))
    r.masses.foreach(m => assert((m - 1).abs < 1e-12, s"mass $m"))
    r.deltas.sliding(2).foreach {
      case Seq(x, y) => assert(y <= x, s"deltas must contract: $x -> $y")
      case _ =>
    }
  }

  test("bit-reproducible under repartitioning (decimal arithmetic, no float sums)") {
    val edges = (1L to 2000L)
      .map(i => (s"h${i % 97}", s"h${(i * 13 + 5) % 97}")).toDF("s", "d")
    val a = PageRank.pageRank(edges, $"s", $"d", iters = 4).ranks
    val b = PageRank.pageRank(edges.repartition(17), $"s", $"d", iters = 4).ranks
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
