package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document-quality RULE CHAIN (Rae et al. 2021 §A1.1, the
  * public heuristic set used by most corpus-curation pipelines between
  * cleaning and sampling): each rule is a named boolean with its underlying
  * statistic exposed, so a curation report can show *why* a document was
  * dropped, not just that it was.
  *
  * Differs from [[TextAnalysis.qualityScore]] (a composite score, t04) and
  * [[QualityClassifier]] (a learned linear model, t64): this is the
  * rule-diagnostics surface.
  *
  * Parity design (the cross-engine oracle must hash-match): every statistic
  * is an exact integer count or an exact-integer-sum divided ONCE in IEEE
  * double; token/line sums use deterministic left-fold order (array order,
  * not shuffle order). Pure codegen'd Column expressions — no UDF, no
  * shuffle, linear scan.
  */
object QualityRules {

  /** Whitespace tokens of trimmed text (the house tokenizer). */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Lines (bullet/ellipsis line statistics operate per line). */
  def lines(text: Column): Column = split(text, "\n")

  private def nonEmpty(ws: Column): Column =
    filter(ws, w => length(w) > 0)

  /** Exact long count of words. */
  def wordCount(text: Column): Column =
    size(nonEmpty(words(text))).cast("long")

  /** Mean word length: exact integer character sum over words, one IEEE
    * division.
    */
  def meanWordLen(text: Column): Column = {
    val ws = nonEmpty(words(text))
    val chars = aggregate(transform(ws, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x)
    when(size(ws) > 0, chars.cast("double") / size(ws))
  }

  /** Fraction of words containing at least one ASCII letter. */
  def alphaWordFrac(text: Column): Column = {
    val ws = nonEmpty(words(text))
    when(size(ws) > 0,
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / size(ws))
  }

  /** Hash-sign + ellipsis occurrences per word (Gopher's symbol-to-word
    * ratio). Non-overlapping counts via the replace-length trick so the
    * oracle reproduces them byte-exactly.
    */
  def symbolWordRatio(text: Column): Column = {
    val symbols = TextAnalysis.occurrences(text, "#") +
      TextAnalysis.occurrences(text, "...") +
      TextAnalysis.occurrences(text, "…")
    when(wordCount(text) > 0, symbols.cast("double") / wordCount(text))
  }

  /** Fraction of lines starting with a bullet marker. */
  def bulletLineFrac(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) > 0,
      size(filter(ls, l => trim(l).rlike("^[-*•]"))).cast("double") / size(ls))
  }

  /** Fraction of lines ending in an ellipsis. */
  def ellipsisLineFrac(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) > 0,
      size(filter(ls, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / size(ls))
  }

  /** Gopher's canonical required-stopword list. */
  val StopWords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** How many of the required stopwords appear as whole tokens. */
  def stopwordHits(text: Column): Column = {
    val ws = words(text)
    StopWords.map(s => when(array_contains(ws, s), 1L).otherwise(0L))
      .reduce(_ + _)
  }

  /** DEFLATE compressibility — the Gopher/RefinedWeb boilerplate proxy
    * (templated spam compresses far better than prose; random junk barely
    * at all). A codegen'd native expression (`graft_deflate_ratio`), NOT
    * part of [[rules]]' default chain — that chain is the published
    * reference-parity heuristic set — so corpora compose it explicitly,
    * e.g. `keep(text) && deflateRatio(text).between(0.25, 0.95)`. Gate
    * t136 pins the signal's invariants (band, self-concat monotonicity,
    * degenerate-repeat separation, partition invariance).
    */
  def deflateRatio(text: Column, level: Int = 6): Column =
    graft.expressions.GraftFunctions.deflateRatio(text, level)

  final case class Thresholds(
      minWords: Long = 10L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopHits: Long = 2L)

  /** The full rule chain as named (rule, boolean) columns; `keep` is their
    * conjunction. Null-safe: an empty document fails the word-count rule
    * and every ratio rule evaluates false (never null) so `keep` is a
    * total boolean.
    */
  def rules(text: Column, t: Thresholds = Thresholds()): Seq[(String, Column)] = {
    def pass(c: Column): Column = coalesce(c, lit(false))
    Seq(
      "r_word_count" -> pass(wordCount(text).between(t.minWords, t.maxWords)),
      "r_mean_word_len" -> pass(meanWordLen(text).between(t.minMeanWordLen, t.maxMeanWordLen)),
      "r_symbol_ratio" -> pass(symbolWordRatio(text) <= t.maxSymbolRatio),
      "r_bullet_lines" -> pass(bulletLineFrac(text) <= t.maxBulletFrac),
      "r_ellipsis_lines" -> pass(ellipsisLineFrac(text) <= t.maxEllipsisFrac),
      "r_alpha_words" -> pass(alphaWordFrac(text) >= t.minAlphaFrac),
      "r_stopwords" -> pass(stopwordHits(text) >= t.minStopHits))
  }

  def keep(text: Column, t: Thresholds = Thresholds()): Column =
    rules(text, t).map(_._2).reduce(_ && _)

  /** Per-(group, rule) IMPACT breakdown — the "why" behind a filter's
    * kill count ([[graft.operators.Profiler.filterImpact]] says WHAT the
    * chain removed; this says WHICH rule did it, per group): for every
    * rule, how many documents fail it (`n_fail`), and how many fail ONLY
    * it (`n_unique_fail` — the documents that single rule alone costs;
    * docs failing several rules are not recovered by relaxing one). The
    * two numbers answer the two curation questions: "which rule is
    * binding?" and "what would relaxing it actually buy?".
    *
    * Scale shape: ONE scan, ONE hash aggregation over un-multiplied rows —
    * the 7 rules fold as 14 conditional aggregates per group (an
    * explode-per-rule shape would feed the aggregate 7× the rows and pay
    * struct churn for nothing); the per-rule unpivot runs AFTER, on
    * |groups| rows. Cross-engine parity: counts exact, `fail_rate` a
    * single IEEE division.
    */
  def ruleImpact(df: DataFrame, groupCol: Column, text: Column,
      t: Thresholds = Thresholds()): DataFrame = {
    val names = rules(text, t).map(_._1)
    val failExprs = rules(text, t).map { case (n, c) =>
      (!c).cast("int").as(s"__f_$n")
    }
    val withNf = df
      .select(groupCol.cast("string").as("group") +: failExprs: _*)
      .withColumn("__nf", names.map(n => col(s"__f_$n")).reduce(_ + _))
    val aggs = names.flatMap { n => Seq(
      sum(col(s"__f_$n")).cast("long").as(s"__fail_$n"),
      sum(when(col(s"__f_$n") === 1 && col("__nf") === 1, 1L).otherwise(0L))
        .as(s"__uniq_$n"))
    }
    withNf.groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .select(col("group"), col("n_docs"),
        explode(array(names.map(n => struct(lit(n).as("rule"),
          col(s"__fail_$n").as("n_fail"),
          col(s"__uniq_$n").as("n_unique_fail"))): _*)).as("__e"))
      .select(col("group"), col("__e.rule").as("rule"), col("n_docs"),
        col("__e.n_fail").as("n_fail"),
        col("__e.n_unique_fail").as("n_unique_fail"),
        (col("__e.n_fail").cast("double") / col("n_docs")).as("fail_rate"))
      .orderBy(col("group"), col("rule"))
  }
}
