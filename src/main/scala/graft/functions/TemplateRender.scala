package graft.functions

import graft.core.RefConfig
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.collection.mutable
import scala.util.matching.Regex

/** Template rendering (SURVEY.md §2.2 P6/P7, §2.6 F1/F2).
  *
  * Reference semantics: `extract_placeholders_from_template`
  * (`src/program1_generate_markdowns.py:126-148`), `render_template`
  * (`:254-319`), `build_template_context` (`:151-180`).
  *
  * Spark-first design: instead of a per-row UDF, the static template is split
  * on the driver into literal segments and placeholder slots, and rendering
  * becomes ONE `concat(lit(seg0), fmt(ctx(p1)), lit(seg1), ...)` expression —
  * whole-stage-codegen'd, vectorizable, zero serialization overhead. This is
  * the `Expression`-composition path of §7.2, reached without custom Catalyst
  * code because the template is loop-invariant (driver data).
  */
object TemplateRender {
  val PlaceholderPattern: Regex = "\\{([a-zA-Z0-9_/]+)\\}".r
  val Missing: String = RefConfig.MissingDataPlaceholder

  /** P7: sorted distinct placeholder names. */
  def extractPlaceholders(template: String): Seq[String] =
    PlaceholderPattern.findAllMatchIn(template).map(_.group(1)).toSeq.distinct.sorted

  /** Template split into (literal segment, following placeholder) pairs plus
    * the trailing literal. Non-matching `{...}` stays literal text.
    */
  def segments(template: String): (Seq[(String, String)], String) = {
    val pairs = mutable.ArrayBuffer.empty[(String, String)]
    var last = 0
    for (m <- PlaceholderPattern.findAllMatchIn(template)) {
      pairs += ((template.substring(last, m.start), m.group(1)))
      last = m.end
    }
    (pairs.toSeq, template.substring(last))
  }

  /** F1 as a single concat Column. `context` maps placeholder name → Column;
    * unresolved placeholders render as the missing sentinel; every
    * substitution passes through F2 number formatting.
    */
  def renderColumn(template: String, context: Map[String, Column]): Column = {
    val (pairs, tail) = segments(template)
    val parts = pairs.flatMap { case (seg, name) =>
      val value = context.getOrElse(name, lit(Missing))
      Seq(lit(seg), Normalize.formatNumber(value))
    } :+ lit(tail)
    concat(parts: _*)
  }

  /** P6: the reference's context projection for a school row — SchoolCode via
    * P1, SurveySchoolYear via P5, SurveyAnswerCategory* via P4, everything
    * else via P1 (absent columns → sentinel).
    */
  def schoolContext(schema: StructType, placeholders: Seq[String]): Map[String, Column] = {
    val surveyPs = placeholders.filter(_.startsWith("SurveyAnswerCategory"))
    placeholders.map { p =>
      val c =
        if (p == "SchoolCode") Normalize.normalizeMissing(schema, p)
        else if (p == "SurveySchoolYear") Normalize.surveyYear(schema, surveyPs)
        else if (p.startsWith("SurveyAnswerCategory")) Normalize.yearCoalesce(schema, p)
        else Normalize.normalizeMissing(schema, p)
      p -> c
    }.toMap + ("SchoolCode" -> Normalize.normalizeMissing(schema, "SchoolCode"))
  }

  /** Plain-Scala render (driver-side + parity tests with the Column path). */
  def renderString(template: String, context: Map[String, String]): String =
    PlaceholderPattern.replaceAllIn(
      template,
      m =>
        Regex.quoteReplacement(
          Normalize.formatNumberStr(context.getOrElse(m.group(1), Missing))))
}
