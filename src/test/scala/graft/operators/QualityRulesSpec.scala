package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String) = {
    Seq(Tuple1(text)).toDF("t")
      .select(
        QualityRules.wordCount($"t").as("n"),
        QualityRules.meanWordLen($"t").as("mwl"),
        QualityRules.alphaWordFrac($"t").as("alpha"),
        QualityRules.symbolWordRatio($"t").as("sym"),
        QualityRules.bulletLineFrac($"t").as("bullet"),
        QualityRules.ellipsisLineFrac($"t").as("ell"),
        QualityRules.stopwordHits($"t").as("stop"))
      .collect()(0)
  }

  test("hand-computed statistics on a crafted document") {
    val r = stats("the cat sat on 123 mats #tag ...")
    assert(r.getLong(0) == 8L)
    // chars: 3+3+3+2+3+4+4+3 = 25 over 8 words
    assert(r.getDouble(1) == 25.0 / 8)
    // alphabetic words: all but "123" and "..."
    assert(r.getDouble(2) == 6.0 / 8)
    // one '#' + one '...'
    assert(r.getDouble(3) == 2.0 / 8)
    assert(r.getLong(6) == 1L) // only "the"
  }

  test("bullet and ellipsis line fractions count per line") {
    val r = stats("- item one\n* item two\nplain line\nteaser...")
    assert(r.getDouble(4) == 2.0 / 4)
    assert(r.getDouble(5) == 1.0 / 4)
  }

  test("empty and whitespace-only documents fail word-count but keep is a total boolean") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "the cat and the hat have to be of use with it now then")).toDF("id", "t")
    val out = df.select($"id", QualityRules.keep($"t").as("keep")).orderBy("id").collect()
    assert(out.map(r => r.isNullAt(1)).forall(_ == false))
    assert(out.map(_.getBoolean(1)).toSeq == Seq(false, false, true))
  }

  test("each rule flips independently around its threshold") {
    val t = QualityRules.Thresholds(minWords = 3, minStopHits = 1)
    def keep(s: String): Boolean =
      Seq(Tuple1(s)).toDF("t").select(QualityRules.keep($"t", t)).collect()(0).getBoolean(0)
    assert(keep("the cat sat on the mat"))
    assert(!keep("the cat")) // too few words
    assert(!keep("cat sat dog ran far")) // no stopwords
    assert(!keep("the cat # # # #")) // symbol ratio 4/6 > 0.1
    assert(!keep("the 12 34 56 78 90")) // alpha frac 1/6 < 0.8
  }

  test("rule columns are deterministic under repartition on the corpus") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val a = docs.select($"doc_id", QualityRules.keep($"text").as("k"))
      .orderBy("doc_id").collect().toSeq
    val b = docs.repartition(7)
      .select($"doc_id", QualityRules.keep($"text").as("k"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
