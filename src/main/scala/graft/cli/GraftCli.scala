package graft.cli

import graft.core.GraftSession
import graft.pipeline.{MarkdownJob, SiteJob}

/** Non-interactive pipeline runner (SURVEY.md §7.1 step 10 — the engine
  * surface of `setup_project.py`'s menu: run stages, sequenced through
  * filesystem checkpoints; the interactive i18n/venv tooling is host
  * environment, not engine capability).
  *
  * Usage:
  *   graft.cli.GraftCli markdown <csv> <template.md> <outDir>
  *   graft.cli.GraftCli site <csv> <aiMarkdownDir> <template.html> <out.html>
  */
object GraftCli {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt,
      appName = "graft-cli")
    try {
      args.toList match {
        case "markdown" :: csv :: template :: outDir :: Nil =>
          val r = MarkdownJob.run(spark, csv, template, outDir)
          println(s"markdown: wrote ${r.written} files to $outDir")
        case "site" :: csv :: mdDir :: template :: outHtml :: Nil =>
          val r = SiteJob.run(spark, csv, mdDir, template, outHtml)
          println(s"site: ${r.schools} schools -> ${r.htmlPath}")
        case "enrich" :: inDir :: outMdDir :: outJsonDir :: promptTpl :: rest =>
          val s = graft.enrich.EnrichJob.run(spark, inDir, outMdDir, outJsonDir,
            promptTpl, limit = rest.headOption.map(_.toInt))
          println(s"enrich: total=${s.total} skipped=${s.skipped} attempted=${s.attempted} " +
            s"successful=${s.successful} failed=${s.failed}")
        case other =>
          System.err.println(s"unknown command: ${other.mkString(" ")}")
          System.err.println(
            "usage: markdown <csv> <tpl> <outDir> | enrich <inDir> <outMdDir> <outJsonDir> <promptTpl> [limit] | site <csv> <mdDir> <tpl> <out.html>")
          sys.exit(2)
      }
    } finally spark.stop()
  }
}
