package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup PAIRS (from any of the DedupOps
  * candidate generators) → connected components → one canonical survivor per
  * cluster. Pair detection alone cannot drive deletion — {a,b}, {b,c} must
  * collapse to ONE keeper, not two independent winners.
  *
  * Algorithm: min-label propagation. Every id starts as its own component;
  * each round, a node adopts the minimum label among itself and its
  * neighbors; converges in O(graph diameter) rounds. Near-dup graphs are
  * near-cliques (diameter 1-2), so 2-3 shuffle rounds in practice; the
  * driver only ever sees a per-round changed-label COUNT (convergence
  * check), never data. For adversarial high-diameter graphs at 100 TB the
  * alternating large-star/small-star variant (Kiveris et al.) drops rounds
  * to O(log d) — same join shapes, noted here as the scale escape hatch.
  */
object DedupClusters {

  /** Labels plus convergence telemetry. `labels` is left persisted (it was
    * materialized by the convergence loop and consumers typically both write
    * it and join it back); `unpersist()` it when done.
    */
  final case class ComponentsResult(labels: DataFrame, converged: Boolean,
      rounds: Int)

  /** Full-visibility variant of [[connectedComponents]]: never throws, the
    * caller inspects `converged` (false iff `maxIter` rounds elapsed with
    * labels still changing — i.e. some component labels are NOT yet minimal).
    */
  def connectedComponentsResult(ids: DataFrame, pairs: DataFrame, idCol: String,
      maxIter: Int = 50): ComponentsResult = {
    val spark = ids.sparkSession
    import spark.implicits._
    // Edges are static across rounds and every round joins them on dst:
    // hash-partition them on dst ONCE (the cache preserves the
    // partitioning), so each round's join exchanges only the labels side —
    // at cluster scale this halves the per-round shuffle volume.
    val edges = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
      .unionAll(pairs.select($"id_b".as("src"), $"id_a".as("dst")))
      .dropDuplicates("src", "dst")
      .repartition(col("dst"))
      .cache()

    // Each round references the previous labels TWICE (join + update), so a
    // plain cache would leave the LOGICAL plan doubling per round —
    // analysis/planning cost explodes around ~15 rounds even though
    // execution reuses the cache. localCheckpoint(eager) truncates lineage
    // to the materialized round, the standard move for iterative DataFrame
    // algorithms.
    var labels = ids.select(col(idCol).as("id"), col(idCol).as("component"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges
        .join(labels.select($"id".as("dst"), $"component".as("ncomp")), Seq("dst"))
        .groupBy($"src").agg(min($"ncomp").as("nmin"))
        .select($"src".as("id"), $"nmin")
      // label update and convergence flag in ONE pass — no extra join with
      // the previous labels just to count changes
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .select($"id",
          least($"component", coalesce($"nmin", $"component")).as("component"),
          ($"nmin" < $"component").as("_changed"))
        .localCheckpoint(true)
      val changed = next.filter($"_changed").count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    ComponentsResult(labels.select($"id".as(idCol), $"component"), converged, iter)
  }

  /** @param ids   DataFrame with column `idCol` (every node, incl. singletons)
    * @param pairs DataFrame with columns (id_a, id_b) — undirected dup edges
    * @return DataFrame[idCol, component] where component = min id reachable.
    *         The result is left persisted (see [[ComponentsResult]]);
    *         `unpersist()` it when done.
    * @throws IllegalStateException if `maxIter` rounds elapse with labels
    *         still changing — the labels would be silently non-minimal and a
    *         downstream [[dropDuplicateClusters]] would keep several
    *         survivors per cluster. Graphs of diameter > `maxIter` (e.g.
    *         long chains of drifting near-dups) need a larger `maxIter` or
    *         the large-star/small-star variant; use
    *         [[connectedComponentsResult]] to accept partial labels
    *         deliberately.
    */
  def connectedComponents(ids: DataFrame, pairs: DataFrame, idCol: String,
      maxIter: Int = 50): DataFrame = {
    val r = connectedComponentsResult(ids, pairs, idCol, maxIter)
    if (!r.converged) {
      r.labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds " +
          "(graph diameter exceeds maxIter); labels would be non-minimal. " +
          "Raise maxIter or call connectedComponentsResult to accept partial labels.")
    }
    r.labels
  }

  /** Alternating large-star/small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * algorithm): converges in O(log² n) rounds regardless of graph DIAMETER,
    * where [[connectedComponentsResult]]'s label propagation needs
    * O(diameter) rounds. This is the scale escape hatch for adversarial
    * shapes — long chains of drifting near-dups — at which propagation
    * would exhaust maxIter.
    *
    *   - large-star(u): every strictly-larger neighbor of u re-attaches to
    *     min(Γ(u) ∪ u);
    *   - small-star(u): u and its smaller neighbors re-attach to the min.
    *
    * Both are one groupBy + one join per round on the (shrinking) edge set;
    * the driver sees only a per-round stability COUNT. On convergence the
    * edge set is a forest of stars rooted at component minima.
    */
  def connectedComponentsStarsResult(ids: DataFrame, pairs: DataFrame,
      idCol: String, maxIter: Int = 30): ComponentsResult = {
    val spark = ids.sparkSession
    import spark.implicits._
    def sym(e: DataFrame): DataFrame =
      e.unionAll(e.select($"v".as("u"), $"u".as("v")))

    // lineage MUST be truncated per round: sym() and the stability check
    // each reference the round's edge set twice, so without checkpointing
    // the logical plan grows exponentially in rounds (see the propagation
    // loop's note). localCheckpoint(eager) = materialize + cut lineage.
    var edges = pairs
      .select(col("id_a").as("u"), col("id_b").as("v"))
      .filter($"u" =!= $"v").distinct().localCheckpoint(true)
    var iter = 0
    var converged = edges.isEmpty
    while (iter < maxIter && !converged) {
      // large-star: for each node, larger neighbors hook onto min(Γ⁺)
      val n1 = sym(edges)
      val m1 = n1.groupBy($"u").agg(min($"v").as("mv"))
        .select($"u", least($"mv", $"u").as("m"))
      val ls = n1.filter($"v" > $"u")
        .join(m1, Seq("u"))
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v").distinct()
      // small-star: orient edges large→small; the big endpoint and all its
      // smaller neighbors hook onto the minimum
      val dir = ls.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
        .filter($"u" =!= $"v").distinct()
      val m2 = dir.groupBy($"u").agg(min($"v").as("m"))
      val ss = dir.join(m2, Seq("u"))
        .select(explode(array($"v", $"u")).as("u"), $"m".as("v"))
        .filter($"u" =!= $"v").distinct().localCheckpoint(true)
      // stable when the round was a no-op (set equality as ONE symmetric-
      // difference job instead of two anti counts — same exactness, half
      // the per-round fixed job cost on small graphs)
      val changed =
        ss.exceptAll(edges).unionAll(edges.exceptAll(ss)).limit(1).count()
      edges = ss
      converged = changed == 0
      iter += 1
    }
    val roots = edges.groupBy($"u").agg(min($"v").as("component"))
    val labels = ids.select(col(idCol).as("id"))
      .join(roots.select($"u".as("id"), $"component"), Seq("id"), "left")
      .select($"id".as(idCol), coalesce($"component", $"id").as("component"))
      .cache()
    labels.count() // materialize while the checkpointed edges are alive
    ComponentsResult(labels, converged, iter)
  }

  /** Star-contraction components with the same contract as
    * [[connectedComponents]] (throws on non-convergence; result persisted).
    */
  def connectedComponentsStars(ids: DataFrame, pairs: DataFrame, idCol: String,
      maxIter: Int = 30): DataFrame = {
    val r = connectedComponentsStarsResult(ids, pairs, idCol, maxIter)
    if (!r.converged) {
      r.labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponentsStars did not converge within $maxIter rounds.")
    }
    r.labels
  }

  /** First-class dedup: keep exactly one row per duplicate cluster — the row
    * whose id equals the cluster's minimum id (deterministic survivor).
    *
    * Uses star contraction: labels are identical to the propagation variant
    * (both oracle-gated against the same transitive closure; cross-validated
    * label-for-label at 250k nodes by `graft.tools.Stress`), but it cannot
    * be exhausted by a high-diameter graph and measured ~1.8× faster at
    * 250k nodes — the safe production default. The labels stay persisted
    * (the returned plan consumes them lazily); callers that need the cache
    * released after writing should call [[connectedComponentsStars]]
    * directly and `unpersist()` themselves, as `GraftCli dedup` does.
    */
  def dropDuplicateClusters(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val comps = connectedComponentsStars(df.select(col(idCol)), pairs, idCol)
    df.join(comps, Seq(idCol))
      .filter(col(idCol) === col("component"))
      .drop("component")
  }

  /** One survivor per duplicate cluster, chosen by QUALITY instead of
    * smallest id: the row with the highest `scoreCol` wins its cluster
    * (smallest id as the deterministic tiebreak). This is what a training
    * pipeline actually wants from dedup — keep the best-written copy of the
    * boilerplate, not the one that happened to be crawled first.
    *
    * Same shuffle shape as [[dropDuplicateClusters]] plus one per-component
    * window (the aggregation a survivor choice inherently costs).
    */
  def dropDuplicateClustersBy(
      df: DataFrame, pairs: DataFrame, idCol: String, scoreCol: Column): DataFrame = {
    val comps = connectedComponentsStars(df.select(col(idCol)), pairs, idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(scoreCol.desc, col(idCol).asc)
    df.join(comps, Seq(idCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "component")
  }
}
