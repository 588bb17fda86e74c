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

  test("ruleImpact: n_fail and n_unique_fail hand-computed per rule") {
    // A fails ONLY r_stopwords (clean 10-word prose, zero stopwords);
    // B fails r_word_count AND r_stopwords (one word) — unique nowhere;
    // C passes everything
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "hi"
    val c = "the cat and the dog sat with all of that have been here today"
    val df = Seq(("g", a), ("g", b), ("g", c)).toDF("grp", "text")
    val got = QualityRules.ruleImpact(df, $"grp", $"text").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 7 && got.values.forall(_._1 == 3L))
    assert(got("r_stopwords") == ((3L, 2L, 1L)), got.toString) // A+B fail; only A uniquely
    assert(got("r_word_count") == ((3L, 1L, 0L)), got.toString) // B, not unique
    Seq("r_mean_word_len", "r_symbol_ratio", "r_bullet_lines",
      "r_ellipsis_lines", "r_alpha_words").foreach { r =>
      assert(got(r) == ((3L, 0L, 0L)), s"$r: ${got(r)}")
    }
    // fail_rate is the single division of those exact counts
    val rates = QualityRules.ruleImpact(df, $"grp", $"text")
      .where($"rule" === "r_stopwords").select($"fail_rate").head().getDouble(0)
    assert(rates == 2.0 / 3.0)
  }
}
