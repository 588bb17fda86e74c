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
}
