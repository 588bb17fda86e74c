package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Artifact reset (reference `reset_project`, `setup_project.py:1145-1203`):
  * delete every file under the pipeline's generated-artifact directories,
  * then prune emptied subdirectories, and report the deleted-file count.
  * Errors on individual files are logged-and-skipped, like the reference.
  *
  * Confirmation is a host/UI concern (the reference prompts y/n in its
  * interactive menu); this engine-level surface is non-interactive.
  */
object ArtifactReset {

  /** The reference's `dirs_to_check` list, relative to the work dir. */
  val ArtifactDirs: Seq[String] = Seq(
    "generated_markdown_from_csv",
    "ai_processed_markdown",
    "ai_raw_responses",
    "generated_descriptions",
    "output",
    "logs")

  /** @return number of files deleted. */
  def reset(workDir: String): Long = {
    var deleted = 0L
    ArtifactDirs.map(Paths.get(workDir, _)).filter(Files.isDirectory(_)).foreach { dir =>
      val walk = Files.walk(dir)
      val entries = try walk.iterator().asScala.toSeq finally walk.close()
      entries.filter(Files.isRegularFile(_)).foreach { f =>
        try { Files.delete(f); deleted += 1 }
        catch { case e: java.io.IOException =>
          System.err.println(s"[reset] error deleting $f: ${e.getMessage}") }
      }
      // deepest-first so emptied parents become deletable (reference sorts
      // rglob results in reverse); the artifact roots themselves stay
      entries.filter(p => p != dir && Files.isDirectory(p))
        .sortBy(_.getNameCount)(Ordering[Int].reverse)
        .foreach { d =>
          try {
            val s = Files.list(d)
            val empty = try !s.iterator().hasNext finally s.close()
            if (empty) Files.delete(d)
          } catch { case e: java.io.IOException =>
            System.err.println(s"[reset] error removing $d: ${e.getMessage}") }
        }
    }
    deleted
  }
}
