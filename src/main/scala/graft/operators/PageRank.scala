package graft.operators

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic PageRank over a link graph — the crawl-prioritization /
  * domain-authority signal (which frontier URLs to fetch first, which
  * hosts to trust in quality scoring).
  *
  * Determinism is the design center: power iteration with DOUBLE ranks is
  * partition-order-dependent (float addition does not associate), so two
  * runs of the same job can disagree in the last ulps and a
  * "repartition-invariant" claim would flake. Here every rank is a
  * DECIMAL(38,18): sums are exact and order-invariant, per-edge divisions
  * round half-up at scale 18 identically on every executor, and the whole
  * fixed-point pipeline is bit-reproducible under any partitioning —
  * asserted, not hoped (the t84 gate reruns the job repartitioned and
  * demands row identity).
  *
  * Semantics: damping `d`, uniform teleport, dangling mass redistributed
  * uniformly each iteration (so total mass stays 1 up to the bounded
  * rounding loss of at most one ulp-at-scale-18 per node per iteration —
  * also gated). Contraction of the damped operator makes successive L1
  * deltas shrink by at least factor `d`; the gate asserts monotone decay.
  *
  * Scale shape: per iteration ONE equi-join of the rank table onto edges
  * and ONE partial-aggregated groupBy(dst) — edges never materialize with
  * text, ranks are (node, decimal) rows; `localCheckpoint` truncates the
  * iterative lineage (standard Spark practice for loops); the only
  * driver-side values are three scalars per iteration (dangling mass,
  * delta, mass).
  */
object PageRank {

  private val Scale = 18
  private val Dec = "decimal(38,18)"

  final case class Result(ranks: DataFrame, deltas: Seq[BigDecimal],
      masses: Seq[BigDecimal])

  /** Run `iters` fixed-point iterations on the DISTINCT simple graph of
    * (src, dst) edges (self-loops allowed; nulls dropped). Returns ranks
    * as (node, rank decimal(38,18)) plus per-iteration L1 deltas and total
    * masses for gating.
    *
    * `trackStats = false` skips the per-iteration delta/mass job (one
    * extra scalar collect per iteration — the dangling collect stays, the
    * computation needs it) for reruns that only want the final ranks,
    * e.g. the t84 gate's repartition-identity twin.
    */
  def pageRank(edges: DataFrame, srcCol: Column, dstCol: Column,
      damping: BigDecimal = BigDecimal("0.85"), iters: Int = 8,
      trackStats: Boolean = true): Result = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val spark = edges.sparkSession
    val e = edges.select(srcCol.cast("string").as("src"),
        dstCol.cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = nodes.count()
    require(n > 0, "empty graph")

    def dec(b: JBigDecimal): Column = lit(b).cast(Dec)
    val one = JBigDecimal.ONE
    val dJ = damping.bigDecimal
    val teleport = one.subtract(dJ)
      .divide(JBigDecimal.valueOf(n), Scale, RoundingMode.HALF_UP)
    val invN = one.divide(JBigDecimal.valueOf(n), Scale, RoundingMode.HALF_UP)

    var ranks = nodes.withColumn("rank", dec(invN)).localCheckpoint()
    val deltas = Seq.newBuilder[BigDecimal]
    val masses = Seq.newBuilder[BigDecimal]

    for (_ <- 1 to iters) {
      val withDeg = ranks.join(outdeg, ranks("node") === outdeg("src"), "left")
      // dangling nodes contribute their mass uniformly; one scalar collect
      val dangling = withDeg.where(col("deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0).cast(Dec)).cast(Dec))
        .collect()(0).getDecimal(0)
      val dangPer = dJ.multiply(dangling)
        .divide(JBigDecimal.valueOf(n), Scale, RoundingMode.HALF_UP)
      // per-edge contribution: decimal division at a CONTROLLED scale —
      // dividing decimal(38,18) by a raw BIGINT makes Spark's precision-
      // loss rule collapse the result to scale 6 (1e-7 error per edge);
      // a decimal(9,0) divisor adjusts back to scale 18 (out-degrees
      // beyond 1e9 would need a wider divisor type)
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          (col("rank") / col("deg").cast("decimal(9,0)")).cast(Dec).as("c"))
      val inflow = contrib.groupBy(col("node"))
        .agg(sum(col("c")).cast(Dec).as("in"))
      // dJ stays at its NATURAL narrow type (decimal(2,2)): multiplying two
      // decimal(38,18)s overflows precision 38 and Spark's precision-loss
      // rule collapses the product to scale 6 — the same trap as the
      // divisor above, caught by the hand-computed spec
      val next = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (dec(teleport) + dec(dangPer) +
            (lit(dJ) * coalesce(col("in"), lit(0).cast(Dec))).cast(Dec))
            .cast(Dec).as("rank"))
        .localCheckpoint()
      if (trackStats) {
        val stats = next.join(ranks.withColumnRenamed("rank", "prev"), "node")
          .agg(sum(abs(col("rank") - col("prev"))).cast(Dec),
            sum(col("rank")).cast(Dec))
          .collect()(0)
        deltas += BigDecimal(stats.getDecimal(0))
        masses += BigDecimal(stats.getDecimal(1))
      }
      ranks = next
    }
    Result(ranks, deltas.result(), masses.result())
  }
}
