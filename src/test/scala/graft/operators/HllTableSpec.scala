package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllTableSpec extends SparkSpec {
  import spark.implicits._

  private def estMap(t: org.apache.spark.sql.DataFrame): Map[String, Long] =
    HllTable.estimates(t).collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def close(est: Long, exact: Long, tol: Double): Boolean =
    math.abs(est - exact.toDouble) / exact <= tol

  test("estimates track exact distincts within the 1024-register error") {
    val df = ((1 to 40).map(i => ("a", s"v$i")) ++
      (1 to 1000).map(i => ("b", s"v${i % 700}")) ++
      (1 to 20000).map(i => ("c", s"v$i"))).toDF("g", "v")
    val est = estMap(HllTable.build(df, $"g", $"v"))
    assert(close(est("a"), 40L, 0.10), s"a -> ${est("a")}") // linear counting
    assert(close(est("b"), 700L, 0.05), s"b -> ${est("b")}")
    // raw harmonic path; classic HLL carries ~2 sigma mid-range bias, so 8%
    assert(close(est("c"), 20000L, 0.08), s"c -> ${est("c")}")
  }

  test("merge is EXACT: merged drop registers row-identical to sketching the union") {
    val drop1 = (1 to 800).map(i => ("a", s"x${i % 500}")).toDF("g", "v")
    val drop2 = (1 to 900).map(i => ("a", s"x${i % 650 + 200}")).toDF("g", "v")
    val merged = HllTable.merge(
      HllTable.build(drop1, $"g", $"v"), HllTable.build(drop2, $"g", $"v"))
    val whole = HllTable.build(drop1.union(drop2), $"g", $"v")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    assert(estMap(merged) == estMap(whole)) // identical registers -> identical numbers
  }

  test("merge is a full union over groups: one-sided groups keep their registers") {
    val a = Seq(("only_a", "1"), ("both", "x")).toDF("g", "v")
    val b = Seq(("only_b", "2"), ("both", "y")).toDF("g", "v")
    val est = estMap(HllTable.merge(
      HllTable.build(a, $"g", $"v"), HllTable.build(b, $"g", $"v")))
    // tiny cardinalities: linear counting is exact to the nearest integer
    assert(est == Map("only_a" -> 1L, "only_b" -> 1L, "both" -> 2L))
  }

  test("sketching is partition-invariant: identical registers from any layout") {
    val df = (1 to 5000).map(i => (s"g${i % 3}", s"v${i % 1700}")).toDF("g", "v")
    val one = HllTable.build(df, $"g", $"v")
    val many = HllTable.build(df.repartition(23), $"g", $"v")
    assert(one.exceptAll(many).isEmpty && many.exceptAll(one).isEmpty)
    assert(estMap(one) == estMap(many))
  }

  test("register table is bounded by m rows per group regardless of input size") {
    val df = (1 to 50000).map(i => ("g", s"v$i")).toDF("g", "v")
    val n = HllTable.build(df, $"g", $"v").count()
    assert(n <= HllTable.M, s"$n registers")
  }
}
