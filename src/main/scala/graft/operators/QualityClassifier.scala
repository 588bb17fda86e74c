package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document-quality scoring — the corpus-filtering step between
  * cleaning and sampling: a linear classifier over cheap text statistics
  * decides per document whether it enters the training mix (FastText-style
  * quality filters, "educational value" scorers, spam screens all share this
  * shape: featurize -> dot product -> threshold).
  *
  * Engineered for the same two properties as the rest of the text layer:
  *
  *   - '''Scan-speed at 100 TB.''' Features are pure codegen'd Column
  *     expressions (regex counts, length ratios, one split) and the model is
  *     a literal-folded dot product — a narrow projection with NO shuffle,
  *     no UDF, no per-row allocation. The weight vector rides into the plan
  *     as constants (the degenerate form of a broadcast; a learned model
  *     swaps in the same way).
  *   - '''Cross-engine exactness.''' Every feature is integer counts
  *     combined by single IEEE divisions, the dot product is a fixed-order
  *     multiply-add chain, and the squash is RATIONAL — `0.5 + 0.5*z/(1+|z|)`
  *     — because +, *, /, abs are correctly-rounded where exp/log (the usual
  *     sigmoid) differ between libms. The DuckDB oracle reproduces scores
  *     bit-for-bit (t50/t56 house style).
  */
object QualityClassifier {

  /** Feature vector over a text column, fixed order (the model weight order
    * and the oracle SQL both bind to it). All values are dimensionless
    * ratios in small ranges, so one global weight scale works.
    *
    * Zero denominators are PINNED, not left to IEEE: an empty document (and
    * the degenerate zero-token case) gets every ratio feature = 0.0, so its
    * logit is exactly the bias. Without the guard, 0/0 = NaN poisons the
    * score, `keep` silently flips false, and cross-engine parity for those
    * rows rides on each engine's NaN conventions instead of the model.
    */
  def features(text: Column): Seq[(String, Column)] = {
    val chars = length(text)
    val toks = TextAnalysis.tokenCount(text)
    def perChar(numer: Column): Column =
      when(chars === 0, lit(0.0)).otherwise(numer.cast("double") / chars)
    def perTok(numer: Column): Column =
      when(toks === 0, lit(0.0)).otherwise(numer.cast("double") / toks)
    Seq(
      // sentence punctuation share of characters
      "f_punct" -> perChar(length(regexp_replace(text, "[^.!?,;:]", ""))),
      // SHOUTING share
      "f_upper" -> perChar(length(regexp_replace(text, "[^A-Z]", ""))),
      // digit share (tables/serial numbers/boilerplate ids)
      "f_digit" -> perChar(length(regexp_replace(text, "[^0-9]", ""))),
      // stopword density per token (function words signal running prose)
      "f_stop" -> perTok(TextAnalysis.occurrences(text, " the ")),
      // length, saturated at 20k chars and scaled to [0,1]
      "f_len" -> (least(chars, lit(20000)).cast("double") / 20000.0),
      // mean chars per token (very long "tokens" are markup/base64 debris)
      "f_tok_len" -> perTok(chars))
  }

  /** Reference weights for the default filter: reward prose signals
    * (stopwords, moderate length), punish punctuation/caps/digit excess and
    * debris-length tokens. Binary-exact constants (halves/quarters) so no
    * decimal-literal parsing difference can creep into the oracle.
    */
  val DefaultBias: Double = 0.5
  val DefaultWeights: Seq[(String, Double)] = Seq(
    "f_punct" -> -2.0, "f_upper" -> -1.5, "f_digit" -> -2.0,
    "f_stop" -> 4.0, "f_len" -> 1.0, "f_tok_len" -> -0.125)

  /** Raw linear score: bias + fixed-order multiply-add chain. */
  def logit(text: Column, weights: Seq[(String, Double)] = DefaultWeights,
      bias: Double = DefaultBias): Column = {
    val fs = features(text).toMap
    weights.foldLeft(lit(bias)) { case (acc, (name, w)) =>
      acc + lit(w) * fs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown feature $name"))
    }
  }

  /** Rational squash of the logit into (0,1): `0.5 + 0.5*z/(1+|z|)` —
    * monotone like a sigmoid, but every op is correctly-rounded IEEE so the
    * score is bit-identical in any engine. 0.5 corresponds to logit 0.
    */
  def squash(z: Column): Column = lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** Adds `quality_logit`, `quality_score` (squashed) and `keep`
    * (score >= threshold; 0.5 = the decision boundary of the raw model).
    */
  def classify(df: DataFrame, textCol: Column,
      weights: Seq[(String, Double)] = DefaultWeights,
      bias: Double = DefaultBias, threshold: Double = 0.5): DataFrame = {
    val z = logit(textCol, weights, bias)
    df.withColumn("quality_logit", z)
      .withColumn("quality_score", squash(col("quality_logit")))
      .withColumn("keep", col("quality_score") >= threshold)
  }
}
