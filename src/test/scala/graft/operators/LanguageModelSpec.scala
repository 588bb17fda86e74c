package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with known transition structure:
  //   "a b"  appears in docs 1, 2, 3  -> c12(a,b) = 3
  //   "b c"  appears in docs 1, 2     -> c12(b,c) = 2
  //   "c z"  appears only in doc 3    -> c12(c,z) = 1 (the rare transition)
  private def corpus = Seq(
    (1L, "a b c"),
    (2L, "a b c"),
    (3L, "a b x a b c z")).toDF("id", "text")

  test("docBigrams: per-doc pair multiplicities, short docs excluded") {
    val got = LanguageModel.docBigrams(corpus, $"id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got((1L, "a", "b")) == 1L)
    assert(got((3L, "a", "b")) == 2L) // multiplicity within one doc
    assert(got((3L, "b", "x")) == 1L)
    val one = LanguageModel.docBigrams(Seq((9L, "solo"), (10L, "  ")).toDF("id", "text"),
      $"id", $"text")
    assert(one.isEmpty) // <2 tokens -> no transitions, no row
  }

  test("bigramFluency: hand-computed statistics on the tiny corpus") {
    val got = LanguageModel.bigramFluency(corpus, $"id", $"text", minCount = 2)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // corpus model: c12 = {ab:4, bc:3, bx:1, xa:1, cz:1}; c1 = {a:4, b:4, x:1, c:1}
    // (context counts = bigram occurrences, NOT raw token counts); V = 4
    val V = 4.0
    def p(c12: Long, c1: Long) = (c12 + 0.5) / (c1 + 0.5 * V)
    // doc 1 = "a b c": pairs ab (c12=4), bc (c12=3); both known (>=2)
    val (n1, kf1, ac1, mp1) = got(1L)
    assert(n1 == 2L && kf1 == 1.0)
    assert(ac1 == (4.0 + 3.0) / 2)
    assert(mp1 == math.min(p(4, 4), p(3, 4)))
    // doc 3 = "a b x a b c z": ab ab bx xa bc cz -> 6 pairs, rare bx/xa/cz
    val (n3, kf3, ac3, mp3) = got(3L)
    assert(n3 == 6L)
    assert(kf3 == 3.0 / 6.0) // ab, ab, bc known; bx, xa, cz are not
    assert(ac3 == (4.0 + 4.0 + 1.0 + 1.0 + 3.0 + 1.0) / 6)
    assert(mp3 == math.min(p(1, 4), math.min(p(1, 1), p(1, 1))))
  }

  test("fluency ranks corpus-typical text above a shuffled-vocabulary doc") {
    val docs = (1L to 20L).map(i => (i, "the cat sat on the mat and the dog sat too")) :+
      (99L, "mat the too cat dog on and sat the the")
    val got = LanguageModel.bigramFluency(docs.toDF("id", "text"), $"id", $"text")
      .select($"doc_id", $"known_frac", $"min_p").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L)._1 > got(99L)._1) // typical transitions are "known"
    assert(got(1L)._2 > got(99L)._2) // and never as surprising
  }

  test("fit on corpus A, score corpus B: unseen transitions smooth, never drop") {
    // model from `corpus`: c12 = {ab:4, bc:3, bx:1, xa:1, cz:1},
    // c1 = {a:4, b:4, x:1, c:1}, V = 4
    val model = LanguageModel.fit(corpus, $"id", $"text")
    val fresh = Seq((7L, "a b q"), (8L, "q q")).toDF("id", "text")
    val got = LanguageModel.score(fresh, $"id", $"text", model)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val V = 4.0
    // doc 7: ab (c12=4, c1(a)=4) + bq (unseen pair, KNOWN context b: c1=4)
    val (n7, kf7, ac7, mp7) = got(7L)
    assert(n7 == 2L && kf7 == 0.5 && ac7 == (4.0 + 0.0) / 2)
    assert(mp7 == (0.0 + 0.5) / (4.0 + 0.5 * V)) // smoothed unseen-pair prob
    // doc 8: qq — unseen pair AND unseen context: (0+a)/(0+aV) = 1/V
    val (n8, kf8, ac8, mp8) = got(8L)
    assert(n8 == 1L && kf8 == 0.0 && ac8 == 0.0)
    assert(mp8 == 0.5 / (0.5 * V))
  }

  test("corpus tokenization is shared, not recomputed, across the model branches") {
    // c1/V derive from the distinct-bigram table, and the two remaining
    // corpus-tokenization branches (c12 build, join-back) share a canonical
    // exchange — at runtime the corpus must be tokenized once, not four times
    val df = LanguageModel.bigramFluency(corpus, $"id", $"text")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      df.queryExecution.executedPlan.toString.take(800))
  }

  test("statistics are repartition-invariant (order-invariant aggregation only)") {
    val base = LanguageModel.bigramFluency(corpus, $"id", $"text").orderBy("doc_id").collect()
    val reparted = LanguageModel.bigramFluency(corpus.repartition(13), $"id", $"text")
      .orderBy("doc_id").collect()
    assert(base.sameElements(reparted))
  }

  test("trigramFluency: hand-computed absolute-discount interpolation") {
    // one doc "a b a b a": trigrams (a,b,a) x2, (b,a,b) x1; T = 3
    // p_uni(a) = 2/3; p_bi(a|b) = (2-.75 + .75*1*(2/3)) / 2 = 0.875
    // p_bi(b|a) = (1-.75 + .75*1*(1/3)) / 1 = 0.5
    // p_tri(a|a,b) = (2-.75 + .75*1*.875) / 2 = 0.953125
    // p_tri(b|b,a) = (1-.75 + .75*1*.5) / 1 = 0.625  -> min
    val got = LanguageModel.trigramFluency(
      Seq((1L, "a b a b a")).toDF("id", "text"), $"id", $"text", minCount = 2)
      .collect()(0)
    assert(got.getLong(1) == 3L)                    // n_trigrams
    assert(got.getDouble(2) == 2.0 / 3)             // known3_frac (only c123=2 rows)
    assert(got.getDouble(3) == 5.0 / 3)             // avg_c123 = (2*2 + 1) / 3
    assert(got.getDouble(4) == 0.625)               // min_p3, bit-exact
  }

  test("trigram scoring backs off per level on unseen contexts and stays total") {
    val model = LanguageModel.fitTrigram(
      Seq((1L, "a b c")).toDF("id", "text"), $"id", $"text")
    // unseen trigram context (z,b) backs off to p_bi(c|b) = (1-.75 + .75*1*1)/1 = 1
    val backed = LanguageModel.scoreTrigram(
      Seq((2L, "z b c")).toDF("id", "text"), $"id", $"text", model).collect()(0)
    assert(backed.getLong(1) == 1L && backed.getDouble(4) == 1.0)
    // fully unseen words: every level backs off to an unseen unigram -> 0
    val cold = LanguageModel.scoreTrigram(
      Seq((3L, "x y z")).toDF("id", "text"), $"id", $"text", model).collect()(0)
    assert(cold.getDouble(4) == 0.0 && cold.getDouble(2) == 0.0)
  }

  test("trigram probabilities are a normalized distribution over the vocabulary") {
    // sum over w3 of p_tri(w3 | w1 w2) must be exactly 1 for a seen context
    val corpus3 = Seq((1L, "a b a b c a b a c b a b b")).toDF("id", "text")
    val m = LanguageModel.fitTrigram(corpus3, $"id", $"text")
    val vocab = Seq("a", "b", "c")
    // score synthetic one-trigram docs (a, b, w3) for every w3 in vocab
    val probe = vocab.zipWithIndex
      .map { case (w, i) => (i.toLong, s"a b $w") }.toDF("id", "text")
    val ps = LanguageModel.scoreTrigram(probe, $"id", $"text", m)
      .orderBy("doc_id").collect().map(_.getDouble(4))
    assert(math.abs(ps.sum - 1.0) < 1e-12, s"sum ${ps.sum}")
  }

  test("trigram fluency is repartition-invariant") {
    val base = LanguageModel.trigramFluency(corpus, $"id", $"text")
      .orderBy("doc_id").collect()
    val reparted = LanguageModel.trigramFluency(corpus.repartition(13), $"id", $"text")
      .orderBy("doc_id").collect()
    assert(base.sameElements(reparted))
  }
}
