package graft.operators

import graft.SparkSpec
import graft.functions.{Normalize, TemplateRender}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants over generated inputs (ScalaCheck generators,
  * deterministic seeds) for the operators whose contracts are algebraic.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: FirstWinsDedup is idempotent and keeps exactly one row per key") {
    val rows = samples(
      for {
        k <- Gen.chooseNum(0, 20)
        v <- Gen.alphaStr.map(_.take(8))
      } yield (k, v), 300).zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
    val df = rows.toDF("k", "v", "ord")
    val once = FirstWinsDedup(df, Seq("k"), "ord")
    val twice = FirstWinsDedup(once, Seq("k"), "ord")
    assert(once.count() == df.select("k").distinct().count())
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    // winner is the minimum ord per key
    val winners = once.select($"k", $"ord").as[(Int, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (k, grp) =>
      assert(winners(k) == grp.map(_._3).min)
    }
  }

  test("property: normalizeMissing is idempotent and sentinel-absorbing") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const(""), Gen.const("  "), Gen.const("N/A"), Gen.const("n/a"),
      Gen.const("[Data Saknas]"), Gen.const(" padded "))
    samples(gen, 300).foreach { v =>
      val n1 = Normalize.normalizeMissingStr(v)
      assert(Normalize.normalizeMissingStr(n1) == n1) // idempotent
      assert(n1 == n1.trim && n1.nonEmpty)            // normalized form
    }
  }

  test("property: render leaves templates without placeholders untouched") {
    val tpl = Gen.alphaNumStr.map(_.take(40))
    samples(tpl, 200).foreach { t =>
      assert(TemplateRender.renderString(t, Map.empty) == t)
    }
  }

  test("property: jaccard outputs are symmetric-bounded in [0,1]") {
    val docs = graft.core.Tables.documents(spark, sf0001).limit(100)
    val pairs = DedupOps
      .ngramJaccardPairs(docs.withColumn("g", org.apache.spark.sql.functions.lit(1)),
        "doc_id", "text", "g", n = 3, threshold = 0.0)
      .select($"jaccard").as[Double].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(j => j >= 0.0 && j <= 1.0))
  }

  test("property: connectedComponents equals union-find on random graphs") {
    // reference implementation: classic array union-find
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical label = min node id in the component
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val cases = samples(
      for {
        n <- Gen.chooseNum(2, 25)
        m <- Gen.chooseNum(0, 30)
        es <- Gen.listOfN(m, for {
          a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
        } yield (a.toLong, b.toLong))
      } yield (n, es.filter(e => e._1 != e._2)), 8)
    cases.foreach { case (n, edges) =>
      val ids = (0L until n.toLong).toDF("id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      val got = DedupClusters.connectedComponents(ids, pairs, "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find parents need full path resolution for the min-label compare
      val expect = {
        val uf = unionFind(n, edges)
        val byRoot = uf.groupBy(_._2).flatMap { case (_, m) =>
          val minId = m.keys.min
          m.keys.map(_ -> minId)
        }
        byRoot
      }
      assert(got == expect, s"n=$n edges=$edges")
    }
  }

  test("property: star-contraction components equal union-find on random graphs") {
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val cases = samples(
      for {
        n <- Gen.chooseNum(2, 25)
        m <- Gen.chooseNum(0, 30)
        es <- Gen.listOfN(m, for {
          a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
        } yield (a.toLong, b.toLong))
      } yield (n, es.filter(e => e._1 != e._2)), 8)
    cases.foreach { case (n, edges) =>
      val ids = (0L until n.toLong).toDF("id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      val r = DedupClusters.connectedComponentsStarsResult(ids, pairs, "id")
      assert(r.converged)
      val got = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      r.labels.unpersist()
      val expect = unionFind(n, edges).groupBy(_._2).flatMap { case (_, m) =>
        val minId = m.keys.min; m.keys.map(_ -> minId)
      }
      assert(got == expect, s"n=$n edges=$edges")
    }
  }

  test("star-contraction resolves a 300-link chain in O(log n) rounds (propagation cannot)") {
    // a path graph has diameter = n-1: min-label propagation needs ~n rounds
    // (it throws at maxIter=50), while large-star/small-star contracts it in
    // logarithmically many — the documented scale escape hatch, demonstrated.
    val n = 300L
    val ids = (0L until n).toDF("id")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val r = DedupClusters.connectedComponentsStarsResult(ids, chain, "id")
    assert(r.converged, s"not converged after ${r.rounds} rounds")
    assert(r.rounds <= 15, s"took ${r.rounds} rounds — should be ~log2(300)")
    val labels = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1))
    r.labels.unpersist()
    assert(labels.forall(_._2 == 0L), "every node must label to the chain minimum")
    // and the propagation variant indeed gives up at its default budget
    intercept[IllegalStateException] {
      DedupClusters.connectedComponents(ids, chain, "id", maxIter = 20)
    }
  }

  test("property: exactTokenBudgets bucketed decomposition equals the naive prefix on random corpora") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // randomized corpora: skewed group sizes, zero weights, budgets that
    // bind at arbitrary points (incl. 0 and beyond-total) — the bucketed
    // operator must agree row-for-row with the naive whole-group window on
    // every draw
    val corpusGen = for {
      nGroups <- Gen.chooseNum(1, 4)
      n <- Gen.chooseNum(50, 400)
      rows <- Gen.listOfN(n, for {
        g <- Gen.chooseNum(0, nGroups - 1)
        w <- Gen.oneOf(Gen.const(0L), Gen.chooseNum(1L, 50L))
      } yield (g, w))
      budgets <- Gen.listOfN(nGroups, Gen.oneOf(
        Gen.const(0L), Gen.chooseNum(1L, 500L), Gen.const(1000000L)))
    } yield (rows, budgets)
    samples(corpusGen, 6).zipWithIndex.foreach { case ((rows, budgets), trial) =>
      val df = rows.zipWithIndex
        .map { case ((g, w), i) => (s"d$trial-$i", s"g$g", w) }
        .toDF("id", "g", "w")
      val recipe = budgets.zipWithIndex.map { case (b, g) => s"g$g" -> b }
      val got = Sampling.exactTokenBudgets(df, $"g", $"id", $"w", recipe)
        .select("id", "g", "w")
      val wnd = Window.partitionBy($"g")
        .orderBy(md5($"id".cast("string")), $"id".cast("string"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ref = df.join(recipe.toDF("g", "budget"), "g")
        .withColumn("cumb", coalesce(sum($"w").over(wnd), lit(0L)))
        .where($"cumb" < $"budget").select("id", "g", "w")
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"trial $trial: budgets=$recipe")
    }
  }

  test("property: rrfFuse equals a driver-side reference fusion on random rankings") {
    // two random top-k rankings per trial (distinct ids, ranks 1..n);
    // the distributed fusion must match an exact driver-side RRF —
    // score arithmetic in the SAME fixed order (list 0 first), top-k by
    // (score desc, id)
    for (trial <- 0 until 6) {
      def ranking(seed: Long, n: Int): Seq[(Long, Long)] = {
        val ids = samples(Gen.chooseNum(0L, 40L), 200)
          .map(x => (x * (seed * 2 + 1)) % 41L).distinct.take(n)
        ids.zipWithIndex.map { case (id, i) => (id, i + 1L) }
      }
      val a = ranking(trial + 1L, 12)
      val b = ranking(trial + 7L, 9)
      val k = 8
      val got = TextSearch.rrfFuse(
          Seq(a.toDF("id", "rank"), b.toDF("id", "rank")), k)
        .select($"id".as[Long], $"rrf_score".as[Double], $"fused_rank".as[Long])
        .collect().toSeq.sortBy(_._3)
      val aM = a.toMap
      val bM = b.toMap
      val want = (aM.keySet ++ bM.keySet).toSeq
        .map { id =>
          val s = aM.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            bM.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
          (id, s)
        }
        .sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (id, s, i + 1L) }
      assert(got == want, s"trial $trial:\n got=$got\nwant=$want")
    }
  }
}
