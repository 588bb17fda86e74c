package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def featsOf(text: String): Map[String, Double] = {
    val row = Seq(text).toDF("t")
      .select(QualityClassifier.features(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.getDouble(i) }.toMap
  }

  test("features: hand-computed ratios on crafted strings") {
    val f = featsOf("Ab1. the x") // 10 chars, 3 tokens, 1 '.', 1 'A', 1 digit
    assert(f("f_punct") == 1.0 / 10)
    assert(f("f_upper") == 1.0 / 10)
    assert(f("f_digit") == 1.0 / 10)
    assert(f("f_stop") == 1.0 / 3) // one " the " over 3 whitespace tokens
    assert(f("f_len") == 10.0 / 20000)
    assert(f("f_tok_len") == 10.0 / 3)
  }

  test("logit is the fixed-order weighted sum; squash is the exact rational") {
    val text = "Ab1. the x"
    val f = featsOf(text)
    // same chain order as the operator: bias, then DefaultWeights order
    val expectedZ = QualityClassifier.DefaultWeights
      .foldLeft(QualityClassifier.DefaultBias) { case (acc, (n, w)) => acc + w * f(n) }
    val got = QualityClassifier.classify(Seq(text).toDF("t"), col("t"))
      .select("quality_logit", "quality_score", "keep").collect().head
    assert(got.getDouble(0) == expectedZ) // bit-exact, not approx
    assert(got.getDouble(1) == 0.5 + 0.5 * expectedZ / (1.0 + math.abs(expectedZ)))
    assert(got.getBoolean(2) == (expectedZ >= 0.0))
  }

  test("empty document is pinned to the bias, never NaN") {
    // every per-char ratio guards its zero denominator -> logit is exactly
    // the bias; without the guard 0/0 = NaN would silently drop the doc
    val got = QualityClassifier.classify(Seq((1L, ""), (2L, "   ")).toDF("id", "t"), col("t"))
      .orderBy("id")
      .select("quality_logit", "quality_score", "keep").collect()
    assert(got(0).getDouble(0) == QualityClassifier.DefaultBias)
    assert(got(0).getDouble(1) == 0.5 + 0.5 * 0.5 / 1.5)
    assert(got(0).getBoolean(2))
    // whitespace-only: non-zero chars, one empty "token" — still finite
    assert(!got(1).getDouble(0).isNaN && !got(1).getDouble(1).isNaN)
  }

  test("decision: running prose keeps, caps/digit debris drops") {
    val docs = Seq(
      (1L, "We saw that the model improves when the data is clean. " +
        "It helps to read the results in the morning, and the team agrees."),
      (2L, "XK9 4411 ZZTOP 00AB 99 SERIAL: 77-XY!!!! 0000000 CAPS CAPS CAPS")
    ).toDF("id", "text")
    val got = QualityClassifier.classify(docs, col("text"))
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got(1L) && !got(2L))
  }

  test("classify is a pure narrow projection: no shuffle in the plan") {
    val plan = QualityClassifier.classify(Seq("x").toDF("t"), col("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }
}
