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
        // could resolve outside outDir (separators, '..') instead of writing
        // it. The RAW key is validated, before suffixing — so key ".." is
        // rejected even though ".." + ".md" would be a legal in-dir name.
        if (key != null && content != null && safeKey(key)) {
          var tmp: Path = null
          try {
            val target = dir.resolve(key + suffix)
            tmp = Files.createTempFile(dir, ".graft", ".tmp")
            Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
            Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
            ok.add(1)
          } catch {
            case _: java.io.IOException | _: java.nio.file.InvalidPathException =>
              // a failed row must not leave its temp behind
              if (tmp != null) try Files.deleteIfExists(tmp) catch {
                case _: java.io.IOException => ()
              }
          }
        }
      }
    }
    // All tasks have finished (the action returned): any `.graft*.tmp` left
    // in the directory is an orphan from a crashed task attempt — readers
    // must only ever see fully-renamed files, so sweep them here.
    val sweep = Files.newDirectoryStream(
      Paths.get(outDir).toAbsolutePath.normalize(), ".graft*.tmp")
    try {
      sweep.forEach(p => try { Files.deleteIfExists(p); () } catch {
        case _: java.io.IOException => ()
      })
    } finally sweep.close()
    ok.value
  }

  /** Lexical-only validation of a raw key: no path separators (either
    * platform's), no NULs, and not a bare `.`/`..`. A name passing this
    * cannot leave `outDir` once a fixed suffix is appended.
    *
    * Deliberately string-based — no `Path` round-trip. `dir.resolve(name)`
    * throws `InvalidPathException` for ANY non-ASCII name when the JVM runs
    * with an ASCII `sun.jnu.encoding`, which would silently drop every row
    * with e.g. a Swedish key — a correctness regression vs the reference,
    * whose Python `open()` writes such filenames
    * (`src/program1_generate_markdowns.py:382-388`). Encoding must never be
    * a validity criterion; the forked JVMs additionally run with
    * `-Dfile.encoding=UTF-8 -Dsun.jnu.encoding=UTF-8` (build.sbt) so the
    * physical write succeeds too.
    */
  private[sinks] def safeKey(name: String): Boolean =
    name.nonEmpty &&
    !name.contains('/') && !name.contains('\\') && !name.contains('\u0000') &&
      name != ".." && name != "."
}
