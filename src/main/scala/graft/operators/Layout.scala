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
    * bounds, and the scaling arithmetic stays below 2^(31+bits) — exact in
    * Long for bits <= 31.
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
    def scale(c: Column, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else (c.cast("bigint") - lit(lo)) * lit(mask) / lit(hi - lo)
    val sa = scale(a, bounds.getLong(0), bounds.getLong(1))
    val sb = scale(b, bounds.getLong(2), bounds.getLong(3))
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
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(outPath)
    val after = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }
}
