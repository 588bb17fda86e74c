package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HITS (hubs & authorities) over a link graph — the
  * link-analysis complement of [[PageRank]]: a page is a good HUB when it
  * links to good authorities and a good AUTHORITY when good hubs link to it
  * (Kleinberg's mutual-reinforcement formulation). In a crawl/training-data
  * pipeline the authority score ranks candidate seed hosts and the hub
  * score flags link-farm/directory pages for quality filtering.
  *
  * Determinism follows the t84 PageRank recipe: every score is a
  * DECIMAL(38,18), so distributed sums are exact and order-invariant, and
  * the whole fixed point is bit-reproducible under any partitioning (the
  * t89 gate reruns the job repartitioned and demands row identity — the
  * property double scores cannot give, because float addition does not
  * associate across partition orders).
  *
  * Normalization: HITS scores are only defined up to scale, so each half-
  * step L1-normalizes. The norm is collected as ONE driver scalar (the same
  * bounded-driver-state budget as PageRank's dangling mass) and its
  * reciprocal is applied as a NARROW decimal(12,10) literal multiplier:
  * multiplying decimal(38,18) by decimal(38,18) would trip Spark's
  * precision-loss rule and collapse the product to scale 6, while a
  * (26,18) x (12,10) product keeps >= scale 27 before the final HALF_UP
  * cast back to scale 18 — rounding that is identical on every executor.
  *
  * Scale shape: per half-step ONE equi-join of the score table onto edges
  * and ONE partial-aggregated groupBy — mirrors PageRank exactly; edges
  * carry no payload, lineage is truncated per iteration (`localCheckpoint`),
  * and the only driver-side values are four scalars per iteration (two
  * norms, two L1 deltas).
  */
object Hits {

  private val Scale = 18
  private val Dec = "decimal(38,18)"

  final case class Result(scores: DataFrame, authDeltas: Seq[BigDecimal],
      hubDeltas: Seq[BigDecimal], authNorms: Seq[BigDecimal],
      hubNorms: Seq[BigDecimal])

  /** Run `iters` mutual-reinforcement iterations on the DISTINCT simple
    * graph of (src, dst) edges. Returns (node, hub, auth) with both columns
    * decimal(38,18) L1-normalized to total 1, plus the per-iteration
    * post-normalization L1 deltas and pre-normalization norms for gating.
    */
  /** `trackDeltas = false` skips the per-iteration L1-delta jobs (two extra
    * scalar collects per iteration) — for reruns that only need the final
    * scores, e.g. the gate's repartition-identity twin.
    */
  def hits(edges: DataFrame, srcCol: Column, dstCol: Column,
      iters: Int = 8, trackDeltas: Boolean = true): Result = {
    require(iters >= 1)
    val e = edges.select(srcCol.cast("string").as("src"),
        dstCol.cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph")

    val one = JBigDecimal.ONE
    val invN = one.divide(JBigDecimal.valueOf(n), Scale, RoundingMode.HALF_UP)
    def dec(b: JBigDecimal): Column = lit(b).cast(Dec)

    /** L1-normalize a (node, s) score table: one scalar collect for the
      * norm, then a narrow-literal reciprocal multiply (see class doc).
      * Returns the normalized table and the pre-normalization norm.
      */
    def normalize(scores: DataFrame): (DataFrame, JBigDecimal) = {
      val norm = scores.agg(sum(col("s")).cast(Dec)).collect()(0).getDecimal(0)
      require(norm.signum() > 0, "graph produced an all-zero score vector")
      val inv = one.divide(norm, 10, RoundingMode.HALF_UP)
      val normalized = scores.select(col("node"),
        (col("s").cast("decimal(26,18)") * lit(inv).cast("decimal(12,10)"))
          .cast(Dec).as("s"))
      (normalized, norm)
    }

    /** Push scores across edges: out = groupBy(to)(sum(in(from))), with
      * zero rows restored for nodes that received nothing (their score is
      * 0 this half-step, and the delta/join bookkeeping needs the row).
      */
    def push(in: DataFrame, from: String, to: String): DataFrame = {
      val flowed = e.join(in, e(from) === in("node"))
        .groupBy(e(to).as("node")).agg(sum(col("s")).cast(Dec).as("s"))
      nodes.join(flowed, Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), dec(JBigDecimal.ZERO)).as("s"))
    }

    def l1Delta(cur: DataFrame, prev: DataFrame): JBigDecimal =
      cur.join(prev.withColumnRenamed("s", "prev"), "node")
        .agg(sum(abs(col("s") - col("prev"))).cast(Dec))
        .collect()(0).getDecimal(0)

    var hub = nodes.withColumn("s", dec(invN)).localCheckpoint()
    var auth = nodes.withColumn("s", dec(invN)).localCheckpoint()
    val authDeltas = Seq.newBuilder[BigDecimal]
    val hubDeltas = Seq.newBuilder[BigDecimal]
    val authNorms = Seq.newBuilder[BigDecimal]
    val hubNorms = Seq.newBuilder[BigDecimal]

    for (_ <- 1 to iters) {
      val (nextAuth, na) = normalize(push(hub, "src", "dst"))
      val authC = nextAuth.localCheckpoint()
      val (nextHub, nh) = normalize(push(authC, "dst", "src"))
      val hubC = nextHub.localCheckpoint()
      if (trackDeltas) {
        authDeltas += BigDecimal(l1Delta(authC, auth))
        hubDeltas += BigDecimal(l1Delta(hubC, hub))
      }
      authNorms += BigDecimal(na)
      hubNorms += BigDecimal(nh)
      auth = authC
      hub = hubC
    }
    val scores = hub.withColumnRenamed("s", "hub")
      .join(auth.withColumnRenamed("s", "auth"), "node")
    Result(scores, authDeltas.result(), hubDeltas.result(),
      authNorms.result(), hubNorms.result())
  }
}
