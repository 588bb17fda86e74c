package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan-time pruning at scale.
  *
  * At 100 TB the fastest operator is the scan you never run: multi-dimensional
  * clustering (z-order) keeps per-file min/max ranges narrow on EVERY layout
  * key, so a predicate on any of them skips most files at the parquet footer,
  * and bucketed tables make repeated equi-joins shuffle-free. Neither exists
  * in the reference (a single-node CSV pipeline has no notion of file
  * skipping); both are table-stakes for a Spark-native lakehouse engine.
  */
object Layout {

  /** Morton (z-order) value: interleaves the low `bits` bits of two
    * non-negative integer columns — column `a` on even bit positions,
    * `b` on odd. Pure built-in bit arithmetic, so the whole expression
    * stays inside whole-stage codegen and is exactly reproducible in any
    * engine with shifts (the DuckDB oracle re-derives it bit by bit).
    *
    * Masking to `bits` keeps every intermediate below 2^(2·bits) — no ANSI
    * overflow risk for bits <= 31.
    */
  def zorderValue(a: Column, b: Column, bits: Int = 16): Column =
    zorderValueN(Seq(a, b), bits)

  /** N-dimensional Morton value: bit `i` of column `c` lands at position
    * `i * n + c` (round-robin), so for two columns this is exactly the
    * classic even/odd interleave. Requires `bits * n <= 63`.
    */
  def zorderValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"need at least 2 columns, got $n")
    require(bits >= 1 && bits * n <= 63, s"bits*cols must be in [n,63], got ${bits * n}")
    val mask = (1L << bits) - 1
    val parts = for {
      (c, ci) <- cols.zipWithIndex
      zc = c.cast("bigint").bitwiseAND(lit(mask))
      i <- 0 until bits
    } yield shiftleft(shiftrightunsigned(zc, i).bitwiseAND(lit(1L)), i * n + ci)
    parts.reduce(_ bitwiseOR _)
  }

  /** DuckDB-SQL rendering of [[zorderValue]] over pre-masked BIGINT
    * expressions — used by the registry oracle so both engines compute the
    * interleave from first principles.
    */
  def zorderSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Writes `df` z-ordered on `(a, b)`: range-partitioned into `numFiles`
    * output files by the Morton value and sorted by it within each file, so
    * parquet min/max footers stay narrow in BOTH dimensions. The helper
    * column is dropped before the write (a projection preserves the sort).
    *
    * Raw interleaving only clusters well when both columns occupy similar
    * bit widths — a column whose domain uses 4 bits contributes nothing to
    * the top z-bits next to a 20-bit column, and the layout degenerates to
    * a single-column sort. So both columns are first min-max scaled to the
    * full `bits` width (the cheap analogue of the range-ranking
    * production z-order implementations do); one tiny agg computes the
    * bounds. The scaling division runs in double — for domains past 2^53
    * the scaled value can be off by a few buckets, which only nudges file
    * boundaries (layout quality, never correctness) — and is clamped to
    * `mask` so FP rounding can never produce mask+1 (which the interleave's
    * bit-AND would wrap to z-bucket 0, landing max-value rows in the lowest
    * bucket). An empty or all-null input degenerates to a single constant
    * z-value instead of NPE-ing on the bounds row.
    */
  def zorderWrite(
      df: DataFrame,
      path: String,
      a: Column,
      b: Column,
      numFiles: Int,
      bits: Int = 16): Unit = {
    val mask = (1L << bits) - 1
    val bounds = df.agg(
      min(a.cast("bigint")).as("amin"), max(a.cast("bigint")).as("amax"),
      min(b.cast("bigint")).as("bmin"), max(b.cast("bigint")).as("bmax")).collect().head
    def bound(i: Int): Long = if (bounds.isNullAt(i)) 0L else bounds.getLong(i)
    def scale(c: Column, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else least(
        floor((c.cast("bigint") - lit(lo)).cast("double") * mask / (hi.toDouble - lo.toDouble))
          .cast("bigint"),
        lit(mask))
    val sa = scale(a, bound(0), bound(1))
    val sb = scale(b, bound(2), bound(3))
    df.withColumn("__z", zorderValue(sa.cast("bigint"), sb.cast("bigint"), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** Deterministic [0, 100) bucket from the md5 of a key — the
    * infrastructure-free train/val/test assignment every dataset pipeline
    * needs: stable across runs, engines and cluster sizes (no RNG state),
    * and any tool that can md5 reproduces the exact split membership.
    */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint"), lit(100L))

  /** Named split from [[hashBucket]]: `[0, trainPct) -> train`,
    * `[trainPct, trainPct+valPct) -> val`, rest -> test.
    */
  def hashSplit(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val b = hashBucket(key)
    when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test")
  }

  /** Writes `df` as a bucketed+sorted managed table: `numBuckets` buckets on
    * `key`, sorted by `key` within each bucket. Repartitioning by the key
    * first yields one file per bucket (not one per task × bucket — the
    * small-files failure mode of naive bucketed writes at scale).
    *
    * Joins between two tables bucketed the same way on the join key are
    * shuffle-free: Catalyst recognizes the co-located `HashPartitioning` and
    * plans a zero-`Exchange` sort-merge join (pinned by LayoutSpec). At
    * 100 TB this converts every repeated fact-to-fact join on the bucket key
    * from a full shuffle of both sides into a local merge.
    */
  def bucketWrite(df: DataFrame, tableName: String, key: String, numBuckets: Int): Unit = {
    df.repartition(numBuckets, col(key))
      .write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Equi-join of two identically-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Rewrites a parquet directory into ~`targetBytes`-sized files.
    *
    * Streaming ingests and over-parallel writes leave directories of tiny
    * files; at scale that murders scan throughput (one task + one footer
    * read per file) and NameNode/listing latency. Sizing from the ACTUAL
    * on-disk bytes (not a row-count guess) keeps output files near the
    * target regardless of schema width or encoding. Returns
    * (filesBefore, filesAfter).
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val inP = new Path(inPath)
    val fs = inP.getFileSystem(conf)
    // A Hive-partitioned directory (e.g. split=train/...) is a tree whose
    // LEAF directories are each a flat parquet dir. Compacting leaf by leaf
    // sizes each partition from its own bytes and mirrors the directory
    // structure, so the partition layout (and partition-value inference on
    // read-back) is preserved — a flat input is simply the single-leaf case.
    def leaves(p: Path): Seq[Path] = {
      val st = fs.listStatus(p)
      val here =
        if (st.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))) Seq(p) else Nil
      here ++ st.filter(_.isDirectory).flatMap(d => leaves(d.getPath))
    }
    val rootUri = fs.makeQualified(inP).toUri.getPath
    var before = 0
    var after = 0
    leaves(inP).foreach { leaf =>
      val parts = fs.listStatus(leaf)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      val totalBytes = parts.map(_.getLen).sum
      val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      val rel = fs.makeQualified(leaf).toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val outLeaf = if (rel.isEmpty) outPath else s"$outPath/$rel"
      spark.read.parquet(leaf.toString)
        .repartition(numFiles)
        .write.mode("overwrite").parquet(outLeaf)
      before += parts.length
      after += new Path(outLeaf).getFileSystem(conf)
        .listStatus(new Path(outLeaf))
        .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    }
    (before, after)
  }

  /** Read-side half of the z-order story: file-level min/max pruning.
    *
    * Plain Spark-over-parquet pushes predicates into ROW-GROUP skipping
    * inside each opened file but still schedules a task per file; the
    * file-skipping that makes z-order pay at 100 TB comes from comparing a
    * predicate against per-file column statistics BEFORE planning the scan
    * (what Delta/Iceberg keep in their manifests). This helper reads those
    * statistics straight from the parquet footers — no data pages touched —
    * keeps only files whose [min, max] intersects every requested range,
    * and returns the pruned DataFrame plus (filesKept, filesTotal).
    *
    * Footers are read on the driver: one ~KB footer per file, the same
    * listing cost every lakehouse manifest build pays once. On a z-ordered
    * table (narrow per-file ranges in every layout dimension) a selective
    * range predicate on ANY layout column drops most files here; on an
    * unclustered table the ranges all straddle the predicate and nothing
    * prunes. Missing or non-long statistics keep the file (conservative —
    * pruning must never lose rows). Callers still apply the exact predicate
    * on the result; this only removes files that cannot contain matches.
    */
  def statsPrunedRead(
      spark: SparkSession,
      path: String,
      ranges: Seq[(String, Long, Long)]): (DataFrame, Int, Int) = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val kept = files.filter { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        // a file survives iff for EVERY range some row group's [min, max]
        // intersects it (a row group missing stats counts as intersecting)
        ranges.forall { case (name, lo, hi) =>
          blocks.exists { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == name) match {
              case None => true
              case Some(cc) =>
                val st = cc.getStatistics
                if (st == null || !st.hasNonNullValue) true
                else (st.genericGetMin, st.genericGetMax) match {
                  case (mn: java.lang.Long, mx: java.lang.Long) =>
                    mx >= lo && mn <= hi
                  case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                    mx.toLong >= lo && mn.toLong <= hi
                  case _ => true
                }
            }
          }
        }
      } finally reader.close()
    }
    val df =
      if (kept.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(kept.map(_.getPath.toString).toSeq: _*)
    (df, kept.length, files.length)
  }
}
