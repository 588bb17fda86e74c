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

  private final case class Entry(
      file: String, bytes: Long, rows: Option[Long], md5: Option[String])

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
      withMd5: Boolean): Entry = {
    val in = fs.open(path)
    try {
      val md5hex: Option[String] = if (!withMd5) None else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val buf = new Array[Byte](1 << 20)
        var r = in.read(buf)
        while (r >= 0) { if (r > 0) md.update(buf, 0, r); r = in.read(buf) }
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
      Entry(rel, bytes, rows, md5hex)
    } finally in.close()
  }

  /** Compute the manifest of every visible `*.parquet` part file under
    * `dir` (recursively — partition dirs included), ordered by relative
    * path. Columns: `file`, `bytes`, `rows` (null when the footer is
    * unreadable), `md5` (null when `withMd5 = false` — the QUICK tier,
    * which reads only each file's parquet tail, never its bytes).
    */
  def manifest(spark: SparkSession, dir: String,
      withMd5: Boolean = true): DataFrame = {
    import spark.implicits._
    val (_, parts) = listParts(spark, dir)
    val conf = spark.sparkContext.broadcast(
      new ConfCarrier(spark.sessionState.newHadoopConf()))
    val n = math.max(1, math.min(parts.size,
      spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(parts, n)
      .map { case (rel, uri, bytes) =>
        val path = new org.apache.hadoop.fs.Path(uri)
        entryOf(path.getFileSystem(conf.value.value), path, rel, bytes, withMd5)
      }
      .toDF()
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
  def write(spark: SparkSession, dir: String): DataFrame = {
    // one file: the manifest is |files| rows — driver-scale by definition
    manifest(spark, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_manifest")
    spark.read.parquet(s"$dir/_manifest")
  }

  /** Whether `dir` carries a stored `_manifest`, resolved through the
    * Hadoop FileSystem API — the same resolution every other manifest
    * operation uses, so the consumer-side integrity gate fires on ANY
    * filesystem the release can live on (HDFS/S3 URIs included), not just
    * the local one a `java.nio.file` probe would see.
    */
  def hasManifest(spark: SparkSession, dir: String): Boolean = {
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
    * Two tiers. `mode = "full"` (the sealing/CLI default) re-streams every
    * byte for the md5 — it binds CONTENT, catching even a same-length byte
    * flip, at the cost of re-reading the release. `mode = "quick"` checks
    * the file set, byte sizes, and parquet-footer row counts from each
    * file's tail only — it catches truncation, a missing or stray part,
    * and any corruption that moves the length or the footer, WITHOUT
    * reading the data; what it provably cannot catch is a length-preserving
    * flip in the page bytes (md5_actual is null in quick rows — the digest
    * was never computed, not "matched"). Consumers on the hot path (e.g.
    * [[graft.operators.TrainingOrder.readShardRange]]) default to quick so
    * the integrity gate does not double a 100 TB job's read volume; run
    * full before sealing or after any incident.
    */
  def verify(spark: SparkSession, dir: String,
      mode: String = "full"): DataFrame = {
    require(mode == "full" || mode == "quick",
      s"verify mode must be full|quick, got '$mode'")
    val stored = spark.read.parquet(s"$dir/_manifest")
      .withColumnsRenamed(Map("bytes" -> "bytes_manifest",
        "rows" -> "rows_manifest", "md5" -> "md5_manifest"))
    val actual = manifest(spark, dir, withMd5 = mode == "full")
      .withColumnsRenamed(Map("bytes" -> "bytes_actual",
        "rows" -> "rows_actual", "md5" -> "md5_actual"))
    stored.join(actual, Seq("file"), "full_outer")
      .withColumn("status",
        when(col("bytes_actual").isNull, lit("missing"))
          .when(col("bytes_manifest").isNull, lit("extra"))
          .when(col("bytes_manifest") === col("bytes_actual") &&
            (col("rows_manifest") <=> col("rows_actual")) &&
            (lit(mode == "quick") || col("md5_manifest") === col("md5_actual")),
            lit("ok"))
          .otherwise(lit("changed")))
      .select("file", "status", "bytes_manifest", "bytes_actual",
        "rows_manifest", "rows_actual", "md5_manifest", "md5_actual")
      .orderBy(
        when(col("status") === "missing", 0).when(col("status") === "changed", 1)
          .when(col("status") === "extra", 2).otherwise(3),
        col("file"))
  }
}
