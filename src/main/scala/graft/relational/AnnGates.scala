package graft.relational

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared verdict construction for the approximate-top-k gate rows (t12
  * SRP-LSH, t22 IVF). An approximate top-k's exact output depends on its
  * bucketing, which DuckDB cannot re-derive — but its CONTRACT is made of
  * theorems plus one deterministic scalar, all checkable against a constant
  * one-row oracle:
  *
  *  - every emitted sim must equal the exact cosine recomputed from the
  *    corpus vectors (the operator scores candidates exactly — value
  *    identity is a theorem, same recipe as the t47 soundness gate);
  *  - ranks must be dense 1..n (n <= k) in (sim desc, neighbor_id) order —
  *    the unique tiebreak makes the ordering total, hence checkable;
  *  - no self-neighbors, no duplicate neighbors per query;
  *  - recall@k vs the brute-force twin must clear a per-method floor: the
  *    bucketing is hash-derived and the k-means seed fixed, so recall is
  *    byte-stable per corpus and a silent collapse emits a violation row
  *    instead of drifting unobserved (floors from the t25 measurement).
  */
object AnnGates {

  val oracle: String =
    "SELECT CAST(-1 AS BIGINT) AS id_a, CAST(-1 AS BIGINT) AS id_b, 'sentinel' AS reason"

  /** Shared ANN gate fixtures, built ONCE per (sfDir, JVM) — the t57
    * playbook applied to the PQ tier: a bench sweep re-ran every gate's
    * in-query quantizer training on all three passes (t117-t119 + t126 =
    * 98.3 s of round-14's gate total), yet the assertions only need the
    * RESULTING model/index, which is deterministic per corpus. t118 keeps
    * training in-query as the end-to-end canary; the other gates assert
    * against these fixtures. Temp-dir indexes are built behind a lock
    * (Verify/Bench run queries sequentially; the lock makes the fixture
    * safe anywhere).
    */
  object Fixture {
    import graft.operators.{ProductQuantizer => PQ}
    private val cache = scala.collection.mutable.HashMap.empty[String, Any]
    private def memo[T](key: String)(build: => T): T = synchronized {
      cache.getOrElseUpdate(key, build).asInstanceOf[T]
    }

    /** The PQ-tier gates' REDUCED fixture corpus: the vec_id % 3 residue
      * class (round-18, the structural fix that took the graph gates
      * 39 s → 6 s applied to the ANN tier — r17's gate block was 64% of
      * bench wall, dominated by per-gate quantizer training). The gate
      * assertions are theorems plus a recall floor, both meaningful on
      * any deterministic corpus; the floors were re-measured on THIS
      * corpus before the move (GateProbe `fixtures` sweep, 2026-08-16:
      * append 1.000/0.600/0.933, filtered-on-shared-index
      * 0.867/0.667/0.733, adaptive-1/10 1.000 everywhere, OPQ
      * 0.933/0.933/0.867 across sf0.001/0.01/0.1 — every 0.6 floor
      * holds). t118 keeps FULL-corpus in-query training as the
      * end-to-end canary.
      */
    def reduced(s: org.apache.spark.sql.SparkSession,
        d: String): DataFrame = {
      import org.apache.spark.sql.functions.col
      graft.core.Tables.embeddings(s, d).where(col("vec_id") % 3 === 0)
    }

    /** Full-corpus raw PQ model at the t117 config (m=16, nCodes=16). */
    def rawModel(s: org.apache.spark.sql.SparkSession,
        d: String): PQ.PqModel = memo(s"rawModel:$d") {
      PQ.train(graft.core.Tables.embeddings(s, d), "embedding", 16, 16)
    }

    /** Half-built + appended residual IVF-PQ index over the [[reduced]]
      * corpus (the t119 lifecycle: build on one half, append the other
      * under both frozen quantizers). ALSO the query target of the
      * filtered gates t126/t128 — the appended index covers the same
      * corpus a fresh full build would, so a second full-build fixture
      * bought nothing but its training wall.
      */
    def halfAppendedResidualDir(s: org.apache.spark.sql.SparkSession,
        d: String): String = memo(s"halfAppendedResidual:$d") {
      import s.implicits._
      val emb = reduced(s, d)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_fix_ivfpq_app").toString
      PQ.ivfPqBuildResidual(emb.where($"vec_id" % 6 === 0), "vec_id",
        "embedding", 8, 16, 16, dir)
      PQ.ivfPqAppend(s, dir, emb.where($"vec_id" % 6 =!= 0),
        "vec_id", "embedding")
      dir
    }

    /** OPQ (rotated residual) IVF-PQ index over the [[reduced]] corpus at
      * the same gate config — t133's query target.
      */
    def opqDir(s: org.apache.spark.sql.SparkSession,
        d: String): String = memo(s"opqDir:$d") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_fix_opq").toString
      PQ.ivfPqBuildOpq(reduced(s, d), "vec_id",
        "embedding", 8, 16, 16, dir)
      dir
    }

    /** Plain-IVF index over the [[reduced]] corpus, 8 cells — the batched
      * dense-serving rows' query target (t142/t143): at nProbe = 8 every
      * cell is probed, so the query is EXACTLY brute force over the live
      * corpus and a DuckDB oracle can recompute the full value set.
      */
    def ivfReducedDir(s: org.apache.spark.sql.SparkSession,
        d: String): String = memo(s"ivfReducedDir:$d") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_fix_ivf").toString
      graft.operators.Similarity.ivfBuild(reduced(s, d), "vec_id",
        "embedding", nCells = 8, indexDir = dir)
      dir
    }
  }

  def verdict(corpus: DataFrame, queries: DataFrame, topkIn: DataFrame, k: Int,
      recallFloor: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // five violation branches consume the operator's top-k; materialize it
    // once or each branch re-executes the whole ANN pipeline (the in-sweep
    // t22 cost was 22 s with recomputation vs ~3 s checkpointed)
    val topk = topkIn.localCheckpoint()
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val simMismatch = topk
      .join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .filter(Similarity.cosine($"qv", $"cv") =!= $"sim")
      .select($"query_id".as("id_a"), $"neighbor_id".as("id_b"),
        lit("sim_mismatch").as("reason"))
    val selfN = topk.filter($"neighbor_id" === $"query_id")
      .select($"query_id".as("id_a"), $"neighbor_id".as("id_b"),
        lit("self_neighbor").as("reason"))
    val dupN = topk.groupBy($"query_id", $"neighbor_id")
      .agg(count(lit(1)).as("n")).filter($"n" > 1)
      .select($"query_id".as("id_a"), $"neighbor_id".as("id_b"),
        lit("dup_neighbor").as("reason"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id")
    val badRank = topk
      .withColumn("expected", row_number().over(w).cast("long"))
      .filter($"rank" =!= $"expected" || $"rank" > k || $"rank" < 1)
      .select($"query_id".as("id_a"), $"neighbor_id".as("id_b"),
        lit("bad_rank").as("reason"))
    // used twice (hit count + denominator) — one brute-force pass, not two
    val bf = Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .localCheckpoint()
    val lowRecall = topk.join(bf, Seq("query_id", "neighbor_id"))
      .agg(count(lit(1)).as("hits"))
      .crossJoin(bf.agg(count(lit(1)).as("denom")))
      .filter($"hits".cast("double") < $"denom".cast("double") * recallFloor)
      .select(lit(-2L).as("id_a"), lit(-2L).as("id_b"),
        lit("low_recall").as("reason"))
    val sentinel = Seq((-1L, -1L, "sentinel")).toDF("id_a", "id_b", "reason")
    simMismatch.unionAll(selfN).unionAll(dupN).unionAll(badRank)
      .unionAll(lowRecall).unionAll(sentinel)
      .orderBy($"id_a", $"id_b", $"reason")
  }
}
