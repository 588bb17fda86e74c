package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Keyed-filename sinks (SURVEY.md §2.8 K1/K2): one file per row, named
  * `{key}{suffix}`.
  *
  * Reference semantics: Program 1 writes `{SchoolCode}.md` per row
  * (`src/program1_generate_markdowns.py:382-388`), Program 2 writes
  * `{id}_ai_description.md` / `{id}_gpt4o_response.json`
  * (`src/program2_ai_processor.py:587-613`).
  *
  * Executed with `foreachPartition`: each task writes its rows to a temp file
  * and atomically renames — idempotent under task retries (last rename wins,
  * content is deterministic per key), which is the distributed analogue of
  * the reference's skip-if-exists semantics. Write failures are counted, not
  * fatal (reference logs and skips the row).
  */
object KeyedFileSink {

  /** Writes `contentCol` of each row to `outDir/{keyCol}{suffix}`.
    * @return number of files successfully written
    */
  def write(df: DataFrame, keyCol: String, contentCol: String, outDir: String,
      suffix: String = ""): Long = {
    val spark = df.sparkSession
    Files.createDirectories(Paths.get(outDir))
    val ok: LongAccumulator = spark.sparkContext.longAccumulator("keyed_files_written")
    val projected = df.selectExpr(s"cast(`$keyCol` as string) as k", s"`$contentCol` as v")
    projected.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val dir = Paths.get(outDir).toAbsolutePath.normalize()
      rows.foreach { row =>
        val key = row.getString(0)
        val content = row.getString(1)
        // Keys are data-derived (e.g. CSV SchoolCode): reject anything that
        // could resolve outside outDir (separators, '..') instead of writing it.
        if (key != null && key.nonEmpty && content != null && safeKey(dir, key + suffix)) {
          try {
            val target = dir.resolve(key + suffix)
            val tmp: Path = Files.createTempFile(dir, s".$key", ".tmp")
            Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
            Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
            ok.add(1)
          } catch { case _: java.io.IOException => () }
        }
      }
    }
    ok.value
  }

  /** True iff `name` stays a direct child of `dir` once resolved: no path
    * separators (either platform's), no `..`/`.` components, no NULs.
    */
  private[sinks] def safeKey(dir: Path, name: String): Boolean =
    !name.contains('/') && !name.contains('\\') && !name.contains('\u0000') &&
      name != ".." && name != "." &&
      (try {
        val target = dir.resolve(name).normalize()
        target.getParent == dir && target.startsWith(dir)
      } catch { case _: java.nio.file.InvalidPathException => false })
}
