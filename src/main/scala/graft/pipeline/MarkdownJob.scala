package graft.pipeline

import graft.core.RefConfig
import graft.functions.{Normalize, TemplateRender}
import graft.sinks.KeyedFileSink
import graft.sources.SchoolCsv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Program 1 equivalent (SURVEY.md §3.1): CSV → one rendered Markdown file
  * per school.
  *
  * Spark plan: `read.csv → filter(SchoolCode present) → select(render)` —
  * the whole 110-placeholder context projection and template render fuse
  * into one codegen'd `concat` expression (see TemplateRender), then a
  * keyed-file sink. No shuffle anywhere; scales linearly with input splits.
  */
object MarkdownJob {

  final case class Result(written: Long)

  /** @return count of markdown files written (reference A1 semantics). */
  def run(spark: SparkSession, csvPath: String, templatePath: String,
      outDir: String): Result = {
    // S5: template is driver data, loaded once; ≥1 placeholder required
    // (`src/program1_generate_markdowns.py:322-341`).
    val template = new String(
      Files.readAllBytes(Paths.get(templatePath)), StandardCharsets.UTF_8)
    val placeholders = TemplateRender.extractPlaceholders(template)
    require(placeholders.nonEmpty, s"No placeholders found in template: $templatePath")

    val rows = SchoolCsv.read(spark, csvPath)
    if (!rows.schema.fieldNames.contains("SchoolCode")) return Result(0)

    val schema = rows.schema
    val context = TemplateRender.schoolContext(schema, placeholders)
    // internal name that cannot case-insensitively collide with (and
    // replace) a real CSV column — render must see the RAW row values
    val keyed = rows
      .filter(Normalize.normalizeMissing(schema, "SchoolCode") =!= Normalize.Missing)
      .withColumn("_graft_code", Normalize.normalizeMissing(schema, "SchoolCode"))

    // Reference: each row overwrites `{code}.md` in file order, so the LAST
    // duplicate's content survives (`program1_generate_markdowns.py:382-388`).
    // Under local[32] an arbitrary task would win the rename race; dedup to
    // the deterministic winner BEFORE rendering: the winner set is a 2-column
    // map-side-combined aggregation (not a shuffle of rendered docs), the
    // join back broadcasts when keys are few (AQE), and losers are never
    // rendered at all. (The reference's returned count includes overwrites;
    // ours counts distinct files — identical whenever SchoolCodes are
    // unique, as in the shipped dataset.)
    val winners = keyed
      .groupBy(col("_graft_code"))
      .agg(max(col("_file_order")).as("_file_order"))
    val rendered = keyed
      .join(winners, Seq("_graft_code", "_file_order"))
      .select(col("_graft_code").as("school_code"),
        TemplateRender.renderColumn(template, context).as("doc"))

    Result(KeyedFileSink.write(rendered, "school_code", "doc", outDir, ".md"))
  }
}
