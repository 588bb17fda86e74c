package graft.pipeline

import graft.core.RefConfig
import graft.functions.{MarkdownHtml, TextClean}
import graft.operators.FirstWinsDedup
import graft.sources.SchoolCsv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import scala.util.Try

/** Program 3 equivalent (SURVEY.md §3.3): CSV + AI-markdown dir → one
  * self-contained HTML site.
  *
  * Spark plan: `read.csv.select(2 cols) → first-wins dedup (window) →
  * broadcast left join (descriptions) → md→html UDF → to_json(collect_list
  * (struct))` → driver-side template splice → single-file sink. The only
  * driver materialization is the final JSON string (one row); at scale the
  * join stays a broadcast as long as the description corpus fits, else AQE
  * picks SMJ.
  */
object SiteJob {

  final case class Result(schools: Long, htmlPath: String)

  private val mdToCleanHtml = udf { (md: String) =>
    if (md == null) RefConfig.FallbackDescriptionHtml
    else
      Try(TextClean.cleanHtmlOutput(MarkdownHtml.markdownToHtml(md)))
        .getOrElse(RefConfig.ErrorDescriptionHtml)
  }

  def run(spark: SparkSession, csvPath: String, aiMarkdownDir: String,
      templatePath: String, outHtmlPath: String): Result = {
    import spark.implicits._

    val htmlTemplate = new String(
      Files.readAllBytes(Paths.get(templatePath)), StandardCharsets.UTF_8)

    // S2 → P3 filter → O1 first-wins dedup → P8 fallback name → O2 sort.
    val projected = Try(SchoolCsv.readProjection(spark, csvPath)).toOption
    val schools = projected match {
      case None => spark.emptyDataFrame.selectExpr("'' as id", "'' as name", "0L as _file_order").limit(0)
      case Some(df) =>
        FirstWinsDedup(
          df.withColumn("id", trim($"SchoolCode")).filter($"id" =!= ""),
          Seq("id"), "_file_order")
          .withColumn(
            "name",
            when(trim($"SchoolName") === "",
              format_string(RefConfig.FallbackSchoolNameFormat, $"id"))
              .otherwise(trim($"SchoolName")))
          .select($"id", $"name", $"_file_order")
    }

    // J1: broadcast left join against the description corpus; missing file →
    // fallback HTML, convert error → error HTML.
    val descriptions = Try(
      SchoolCsv.readDocumentDir(spark, aiMarkdownDir, RefConfig.AiProcessedSuffix)
    ).getOrElse(Seq.empty[(String, String)].toDF("key", "content"))

    val joined = schools
      .join(broadcast(descriptions), schools("id") === descriptions("key"), "left_outer")
      .select($"id", $"name", mdToCleanHtml($"content").as("ai_description_html"),
        $"_file_order")
      .orderBy($"name", $"_file_order") // Python stable sort by name (O2)

    // F7: the record JSON matches the reference's `json.dumps(..., ensure_ascii
    // =False)` byte format — key order (id, name, ai_description_html) and
    // `", "`/`": "` separators (`src/program3_generate_website.py:425`). The
    // ordered collect is a driver materialization of the final (small,
    // per-school) records — the reference does the same; at larger scale
    // this would switch to `to_json(collect_list(struct(...)))`.
    val records = joined.select($"id", $"name", $"ai_description_html").collect()
    val nSchools = records.length.toLong
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val schoolsJson = records
      .map(r =>
        s"""{"id": "${esc(r.getString(0))}", "name": "${esc(r.getString(1))}", "ai_description_html": "${esc(r.getString(2))}"}""")
      .mkString("[", ", ", "]")

    val html =
      if (nSchools == 0) RefConfig.NoDataHtml // K4
      else htmlTemplate.replace("{school_list_json}", schoolsJson) // F8

    val out = Paths.get(outHtmlPath)
    Files.createDirectories(out.getParent)
    Files.write(out, html.getBytes(StandardCharsets.UTF_8)) // K3
    Result(nSchools, outHtmlPath)
  }
}
