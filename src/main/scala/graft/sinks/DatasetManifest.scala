package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** Dataset RELEASE manifest — the file-level inventory + integrity record
  * a published dataset ships with, and the check its consumers run before
  * training: per part file, the relative path, byte size, row count, and
  * an md5 content digest. A training run that reads a shard the writer
  * never produced (a stray copy), misses one (partial sync), or reads one
  * that changed since release (re-compaction, bit rot) should fail at the
  * manifest, not at step 40k of the run.
  *
  * Scale shape: ONE distributed pass, one file per task row. The digest
  * STREAMS each file through a fixed 1 MiB buffer (constant memory — a
  * 10 GB part file costs no more heap than a 10 MB one), and the row
  * count comes from the file's OWN parquet footer (a tail-seek + a
  * metadata parse — never a data scan). No shuffle anywhere: the output
  * is |files| rows. The digest binds the bytes, so a footer cannot lie
  * relative to release time — if the footer changed, so did the md5; the
  * spec cross-checks footer counts against a real scan at write time.
  * Failures isolate per file by construction: an unreadable footer yields
  * a null row count for THAT entry (the digest still reports it), never a
  * dead verification pass — a manifest check that dies on the exact
  * corruption it exists to catch would be useless.
  *
  * Hidden-file convention: entries with a `_` or `.` path segment are
  * excluded — the same rule Spark's own file discovery applies — so the
  * stored `_manifest` never lists itself and never changes what the
  * dataset reads as.
  */
object DatasetManifest {

  /** One manifest row: (file, bytes, rows, md5, pagesig) — a plain tuple
    * so the digest pass rides Spark's tuple encoder (the 5-field nested
    * case class tripped janino into a codegen fallback).
    */
  private type Entry =
    (String, Long, Option[Long], Option[String], Option[String])

  /** Sampled-content tier geometry: `PagesPerFile` pages of `PageBytes`
    * each, at offsets derived from the file's RELATIVE PATH (md5-keyed,
    * stratified — one page per equal-width stratum so the samples spread),
    * hashed together into `pagesig`. Files at or under
    * `PagesPerFile × PageBytes` are hashed IN FULL — for them the sampled
    * tier binds content completely. For larger files the tier reads a
    * fixed ~256 KiB regardless of size (~1% of a 25 MB part, ~0.025% of a
    * 1 GB part), catching the same-length page-byte flips the quick tier
    * provably cannot, at a read volume the full-md5 tier cannot match.
    */
  private val PageBytes = 64 * 1024
  private val PagesPerFile = 4

  /** Deterministic page offset for (file, page i): stratified, md5-keyed —
    * a pure function of the relative path, so writer and verifier sample
    * the same bytes with no stored offset table.
    */
  private def pageOffset(rel: String, i: Int, bytes: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$rel:$i".getBytes("UTF-8"))
    val h = java.nio.ByteBuffer.wrap(md, 0, 8).getLong & Long.MaxValue
    val stratum = bytes / PagesPerFile
    val free = math.max(1L, stratum - PageBytes + 1)
    i * stratum + (h % free)
  }

  /** Hadoop Configuration is not Serializable; ship it to tasks via its
    * own wire format (Spark's internal wrapper is `private[spark]`).
    */
  private final class ConfCarrier(
      @transient private var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  /** Recursive driver-side listing of visible `*.parquet` files:
    * (relative path, fully-qualified URI, bytes). Driver cost scales with
    * the file COUNT (the same listing any read of the dataset performs),
    * never with bytes.
    */
  private def listParts(spark: SparkSession,
      dir: String): (String, Seq[(String, String, Long)]) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p).toUri.getPath
    val out = ArrayBuffer.empty[(String, String, Long)]
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        val uriPath = st.getPath.toUri.getPath
        if (uriPath.startsWith(root + "/")) {
          val rel = uriPath.substring(root.length + 1)
          if (rel.endsWith(".parquet") &&
            !rel.split("/").exists(s => s.startsWith("_") || s.startsWith(".")))
            out += ((rel, st.getPath.toString, st.getLen))
        }
      }
    }
    (root, out.sortBy(_._1).toSeq)
  }

  /** One file's manifest entry over an open filesystem: streaming md5
    * (skipped in the QUICK tier — `withMd5 = false` reads only the tail),
    * then the row count from the parquet tail (`footerLen ++ "PAR1"`,
    * little-endian, footer immediately before). Any footer anomaly —
    * short file, wrong magic, unparseable metadata — is a null row count,
    * not an error.
    */
  private def entryOf(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, rel: String, bytes: Long,
      withMd5: Boolean, withPages: Boolean): Entry = {
    val in = fs.open(path)
    try {
      val md5hex: Option[String] = if (!withMd5) None else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val buf = new Array[Byte](1 << 20)
        var r = in.read(buf)
        while (r >= 0) { if (r > 0) md.update(buf, 0, r); r = in.read(buf) }
        Some(md.digest().map("%02x".format(_)).mkString)
      }
      val pagesig: Option[String] = if (!withPages) None else {
        val md = java.security.MessageDigest.getInstance("MD5")
        if (bytes <= PagesPerFile.toLong * PageBytes) {
          // small file: full coverage — sampled tier binds all content
          in.seek(0)
          val buf = new Array[Byte](1 << 16)
          var r = in.read(buf)
          while (r >= 0) { if (r > 0) md.update(buf, 0, r); r = in.read(buf) }
        } else (0 until PagesPerFile).foreach { i =>
          val page = new Array[Byte](PageBytes)
          in.seek(pageOffset(rel, i, bytes))
          in.readFully(page)
          md.update(page)
        }
        Some(md.digest().map("%02x".format(_)).mkString)
      }
      val rows: Option[Long] =
        try {
          if (bytes < 12) None
          else {
            val tail = new Array[Byte](8)
            in.seek(bytes - 8)
            in.readFully(tail)
            if (!(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1')) None
            else {
              val fLen = ByteBuffer.wrap(tail, 0, 4)
                .order(ByteOrder.LITTLE_ENDIAN).getInt
              if (fLen <= 0 || fLen > bytes - 12) None
              else {
                val fb = new Array[Byte](fLen)
                in.seek(bytes - 8 - fLen)
                in.readFully(fb)
                Some(org.apache.parquet.format.Util
                  .readFileMetaData(new java.io.ByteArrayInputStream(fb))
                  .getNum_rows)
              }
            }
          }
        } catch { case NonFatal(_) => None }
      (rel, bytes, rows, md5hex, pagesig)
    } finally in.close()
  }

  /** Compute the manifest of every visible `*.parquet` part file under
    * `dir` (recursively — partition dirs included), ordered by relative
    * path. Columns: `file`, `bytes`, `rows` (null when the footer is
    * unreadable), `md5` (null when `withMd5 = false`), `pagesig` (null
    * when `withPages = false`) — the tier flags decide what gets read:
    * neither = the QUICK tier (only each file's parquet tail), pages only
    * = the SAMPLED tier (~256 KiB per file), md5 = the FULL tier (every
    * byte). Sealing computes all tiers at once (the md5 stream already
    * reads every byte, so the page reads are noise).
    */
  def manifest(spark: SparkSession, dir: String,
      withMd5: Boolean = true, withPages: Boolean = true): DataFrame = {
    val (_, parts) = listParts(spark, dir)
    entriesOf(spark, parts, withMd5, withPages)
  }

  /** The distributed digest pass over an explicit part list — shared by
    * [[manifest]] (all parts) and [[append]] (the new parts only).
    */
  private def entriesOf(spark: SparkSession,
      parts: Seq[(String, String, Long)], withMd5: Boolean,
      withPages: Boolean): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.broadcast(
      new ConfCarrier(spark.sessionState.newHadoopConf()))
    val n = math.max(1, math.min(parts.size,
      spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(parts, n)
      .map { case (rel, uri, bytes) =>
        val path = new org.apache.hadoop.fs.Path(uri)
        entryOf(path.getFileSystem(conf.value.value), path, rel, bytes,
          withMd5, withPages)
      }
      .toDF("file", "bytes", "rows", "md5", "pagesig")
      .orderBy(col("file"))
  }

  /** Compute and persist the manifest beside the data as
    * `dir/_manifest` — the `_` prefix keeps it out of parquet discovery,
    * so writing it does not change what the dataset reads as.
    *
    * Crash posture: Spark's overwrite deletes then writes, so a kill
    * mid-write can leave a partial `_manifest`. That window is LOUD by
    * construction — `verify` fails to read it rather than passing — and
    * healed by re-running `write` (the manifest derives entirely from
    * the data; nothing is lost). The data itself is never touched.
    * @return the stored manifest read back
    */
  def write(spark: SparkSession, dir: String): DataFrame =
      // same writer lease + staged swap as append: a direct overwrite
      // deletes the live manifest BEFORE the new one is complete, so a
      // crash mid-seal left a partial/absent manifest where the rest of
      // the lifecycle guarantees "old complete or new complete"
      graft.operators.IndexLease.withLease(s"$dir/_manifest") {
    graft.operators.IncrementalDedup.recoverDir(s"$dir/_manifest")
    // one file: the manifest is |files| rows — driver-scale by definition.
    // Sealing records every tier (bytes/rows, pagesig, md5), so consumers
    // can verify at whichever cost they can afford. (`_manifest.next`
    // starts with `_`, so the part listing never sees the staging dir.)
    graft.operators.IncrementalDedup.clearStaging(s"$dir/_manifest.next")
    manifest(spark, dir).coalesce(1)
      .write.parquet(s"$dir/_manifest.next")
    graft.operators.IncrementalDedup
      .replaceDir(s"$dir/_manifest", s"$dir/_manifest.next")
    spark.read.parquet(s"$dir/_manifest")
  }

  /** Incrementally seal a GROWN release: digest only the part files not
    * yet in the stored `_manifest` and extend it with their entries —
    * appending one shard to a sealed 100 TB release costs a read of the
    * DELTA, not a re-digest of the world ([[write]] re-streams
    * everything). The combined manifest is rewritten through the staging
    * + atomic-swap discipline ([[graft.operators.IncrementalDedup.replaceDir]]),
    * so a crash never leaves a half-sealed manifest — either the old
    * complete manifest or the new complete one is in place (`verify`
    * before the swap sees the old generation: the new files read as
    * `extra`, loud, never silently absent).
    *
    * Entries already sealed are carried VERBATIM (their files are not
    * re-read), so `write(v1)` + grow + `append` emits entry-for-entry what
    * a fresh full `write` over the grown release would — the spec pins
    * that equivalence. A file that CHANGED since its seal keeps its old
    * entry (this is an append, not a re-seal) and `verify` reports it
    * `changed`, exactly as it should. Pre-pagesig-era entries carry a
    * null `pagesig` after append; run a full re-seal to enable the
    * sampled tier for them.
    *
    * @return the stored manifest read back
    */
  def append(spark: SparkSession, dir: String): DataFrame =
      // append is a read-modify-write of the stored manifest behind one
      // swap — two concurrent appends (two ingest jobs sealing the same
      // grown release) would race it exactly like the index lifecycles,
      // so it runs under the same writer lease; the loser fails loudly
      // and retries against the winner's manifest
      graft.operators.IndexLease.withLease(s"$dir/_manifest") {
    // heal a crashed prior swap FIRST: a crash between replaceDir's two
    // renames leaves only _manifest.old — without this roll-forward the
    // require below fails on a retried append and, worse, hasManifest
    // reads false so shard readers silently skip the integrity gate
    graft.operators.IncrementalDedup.recoverDir(s"$dir/_manifest")
    require(hasManifest(spark, dir),
      s"append needs an existing $dir/_manifest — seal with write() first")
    val stored = spark.read.parquet(s"$dir/_manifest")
    val known = stored.select(col("file"))
      .collect().map(_.getString(0)).toSet // |files| rows — driver-scale
    val (_, parts) = listParts(spark, dir)
    val fresh = parts.filterNot { case (rel, _, _) => known(rel) }
    val storedFull = // pre-pagesig manifests gain the column as nulls
      if (stored.columns.contains("pagesig")) stored
      else stored.withColumn("pagesig", lit(null).cast("string"))
    val combined =
      if (fresh.isEmpty) storedFull.orderBy(col("file"))
      else storedFull
        .unionByName(entriesOf(spark, fresh, withMd5 = true, withPages = true))
        .orderBy(col("file"))
    graft.operators.IncrementalDedup.clearStaging(s"$dir/_manifest.next")
    combined.coalesce(1).write.parquet(s"$dir/_manifest.next")
    graft.operators.IncrementalDedup
      .replaceDir(s"$dir/_manifest", s"$dir/_manifest.next")
    spark.read.parquet(s"$dir/_manifest")
  }

  /** Whether `dir` carries a stored `_manifest`, resolved through the
    * Hadoop FileSystem API — the same resolution every other manifest
    * operation uses, so the consumer-side integrity gate fires on ANY
    * filesystem the release can live on (HDFS/S3 URIs included), not just
    * the local one a `java.nio.file` probe would see.
    */
  def hasManifest(spark: SparkSession, dir: String): Boolean = {
    // a crashed append swap leaves only _manifest.old — heal before
    // probing, or every consumer gate silently reads "no manifest"
    graft.operators.IncrementalDedup.recoverDir(s"$dir/_manifest")
    val p = new org.apache.hadoop.fs.Path(s"$dir/_manifest")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Check the dataset against its stored manifest: one row per file seen
    * on either side with `status` in `ok` (every checked field matches),
    * `changed` (present both sides, any checked field differs), `missing`
    * (in the manifest, not on disk), `extra` (on disk, not in the
    * manifest). Ordered most-severe first, then by path — a clean release
    * reads as an all-`ok` frame.
    *
    * Three tiers. `mode = "full"` (the sealing/CLI default) re-streams
    * every byte for the md5 — it binds CONTENT, catching even a
    * same-length byte flip, at the cost of re-reading the release.
    * `mode = "sampled"` re-hashes each part's keyed sample pages
    * (~256 KiB per file, small files in full) against the sealed
    * `pagesig` — it catches a same-length flip WITH PROBABILITY
    * coverage/bytes per file (certainty for small files), at ~1% of a
    * 25 MB part's read volume; requires a pagesig-era manifest. Entries
    * appended from a pre-pagesig seal carry a null `pagesig` and degrade
    * to quick semantics for that row (size/rows checked, content not) —
    * filter `pagesig_manifest IS NULL` on the result to enumerate the
    * uncovered files, and re-seal full to close them.
    * `mode = "quick"` checks the file set, byte sizes, and parquet-footer
    * row counts from each file's tail only — truncation, a missing or
    * stray part, and any corruption that moves the length or the footer,
    * WITHOUT reading the data; what it provably cannot catch is a
    * length-preserving flip in the page bytes (md5_actual/pagesig_actual
    * are null in quick rows — never computed, not "matched"). Consumers
    * on the hot path (e.g.
    * [[graft.operators.TrainingOrder.readShardRange]]) default to quick so
    * the integrity gate does not double a 100 TB job's read volume; run
    * full before sealing or after any incident, sampled as the middle
    * ground when page-level rot is in the threat model.
    */
  def verify(spark: SparkSession, dir: String,
      mode: String = "full"): DataFrame = {
    require(mode == "full" || mode == "quick" || mode == "sampled",
      s"verify mode must be full|sampled|quick, got '$mode'")
    graft.operators.IncrementalDedup.recoverDir(s"$dir/_manifest")
    val storedRaw = spark.read.parquet(s"$dir/_manifest")
    if (mode == "sampled")
      require(storedRaw.columns.contains("pagesig"),
        s"$dir/_manifest predates the sampled tier (no pagesig column) — " +
          "re-seal with DatasetManifest.write, or verify full|quick")
    val stored = (if (storedRaw.columns.contains("pagesig")) storedRaw
      else storedRaw.withColumn("pagesig", lit(null).cast("string")))
      .withColumnsRenamed(Map("bytes" -> "bytes_manifest",
        "rows" -> "rows_manifest", "md5" -> "md5_manifest",
        "pagesig" -> "pagesig_manifest"))
    val actual = manifest(spark, dir, withMd5 = mode == "full",
        withPages = mode == "sampled")
      .withColumnsRenamed(Map("bytes" -> "bytes_actual",
        "rows" -> "rows_actual", "md5" -> "md5_actual",
        "pagesig" -> "pagesig_actual"))
    val contentOk = mode match {
      case "full" => col("md5_manifest") === col("md5_actual")
      // entries carried from a pre-pagesig manifest by append hold a null
      // pagesig — fall back to quick semantics for them (content
      // unchecked) instead of letting null === x → null read as "changed"
      // and failing a healthy release's loader gate; consumers can list
      // the uncovered entries via pagesig_manifest IS NULL, and a full
      // re-seal upgrades them (the append docstring's advice)
      case "sampled" => col("pagesig_manifest").isNull ||
        col("pagesig_manifest") === col("pagesig_actual")
      case _ => lit(true)
    }
    stored.join(actual, Seq("file"), "full_outer")
      .withColumn("status",
        when(col("bytes_actual").isNull, lit("missing"))
          .when(col("bytes_manifest").isNull, lit("extra"))
          .when(col("bytes_manifest") === col("bytes_actual") &&
            (col("rows_manifest") <=> col("rows_actual")) && contentOk,
            lit("ok"))
          .otherwise(lit("changed")))
      .select("file", "status", "bytes_manifest", "bytes_actual",
        "rows_manifest", "rows_actual", "md5_manifest", "md5_actual",
        "pagesig_manifest", "pagesig_actual")
      .orderBy(
        when(col("status") === "missing", 0).when(col("status") === "changed", 1)
          .when(col("status") === "extra", 2).otherwise(3),
        col("file"))
  }
}
