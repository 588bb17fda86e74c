package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable high-dynamic-range quantile histogram over positive BIGINT
  * metrics (token counts, document lengths, byte sizes) — the quantile
  * member of the engine's sketch family (count-min [[CountMin]] for point
  * frequencies, [[HllTable]] for distinct counts).
  *
  * Design: a value `v > 0` lands in the bucket that keeps only its top
  * `subBits + 1` binary digits — `shift = max(len(bin(v)) - (subBits+1), 0)`,
  * `bucket_lo = (v >> shift) << shift`. Buckets are exponentially spaced
  * with 2^subBits subdivisions per octave, so any bucket's width obeys
  * `width <= bucket_lo / 2^subBits`: every quantile read off the histogram
  * carries a RELATIVE error guarantee of 2^-subBits, independent of the
  * data distribution, with at most `64 * 2^subBits` buckets ever in
  * existence (the DDSketch bound, but over exact bit arithmetic instead of
  * a float logarithm).
  *
  * Why not KLL/GK/t-digest: their compactions are either randomized or
  * insertion-order-dependent, so two merge paths over the same data can
  * disagree — the same trap as DataSketches' HIP-estimated HLL, rejected
  * here on measurement. This histogram is a plain cellwise-mergeable
  * count table: the sketch of a union is the column-sum of the sketches,
  * bit-identical under any partitioning, merge order, or re-sharding —
  * asserted by the t88 gate, hash-gated cross-engine by t87 (both engines
  * print `bin()` unpadded, so the bucket arithmetic is re-derivable in
  * DuckDB from first principles).
  *
  * Scale shape: the sketch is ONE hash-aggregation over (bucket_lo) —
  * map-side partial combine collapses each partition to <= 64 * 2^subBits
  * rows before the shuffle, so a 100 TB scan shuffles kilobytes. Estimation
  * sorts the <= a-few-hundred-row sketch on a single partition (the same
  * bounded-cardinality window precedent as the vocab builder).
  */
object QuantileHist {

  /** Number of kept top bits is subBits + 1; buckets per octave 2^subBits.
    * The Scala `shiftleft` helper only takes literal Int shift amounts, so
    * the column-valued shifts go through `call_function`.
    */
  def bucketLo(v: Column, subBits: Int): Column = {
    require(subBits >= 0 && subBits <= 16, s"subBits in [0,16], got $subBits")
    val shift = greatest(length(bin(v)) - (subBits + 1), lit(0))
    call_function("shiftleft",
      call_function("shiftrightunsigned", v, shift), shift)
  }

  /** Upper edge (inclusive) of the bucket starting at `lo`: the bucket
    * covers [lo, lo + 2^shift - 1] and `len(bin(lo)) = len(bin(v))` for
    * every v in the bucket (the top bit is preserved by construction).
    */
  def bucketHi(lo: Column, subBits: Int): Column =
    lo + call_function("shiftleft", lit(1L),
      greatest(length(bin(lo)) - (subBits + 1), lit(0))) - 1L

  /** Build the sketch: (bucket_lo BIGINT, n BIGINT), one row per occupied
    * bucket. Null and non-positive values are dropped (the histogram is
    * defined over positive magnitudes; count them separately if they are
    * signal). The result IS the mergeable state — persist it, union it,
    * column-sum it.
    */
  def sketch(df: DataFrame, valueCol: Column, subBits: Int = 4): DataFrame = {
    val v = valueCol.cast("bigint")
    df.where(v.isNotNull && v > 0)
      .select(bucketLo(v, subBits).as("bucket_lo"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n"))
  }

  /** Cellwise merge of any number of sketches built with the same subBits. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("bucket_lo"))
      .agg(sum(col("n")).as("n"))

  /** Read quantiles q = num/den (0 < num <= den) off a sketch. For each q
    * the target rank is `ceil(num * N / den)` (1-based, lower-quantile
    * convention, exact long arithmetic — no float rank), and the answer is
    * the bucket containing that rank:
    * (q_num, q_den, rank, est_lo, est_hi) with the guarantee that the true
    * rank-th smallest value lies in [est_lo, est_hi] and
    * est_hi - est_lo <= est_lo / 2^subBits.
    */
  def estimate(sketch: DataFrame, qs: Seq[(Long, Long)], subBits: Int = 4): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (n, d) => n > 0 && n <= d },
      "quantiles must satisfy 0 < num <= den")
    val spark = sketch.sparkSession
    import spark.implicits._
    // bounded cardinality by construction (<= 64 * 2^subBits rows): a
    // single-partition running sum is the right plan, not a skew risk
    val w = Window.orderBy(col("bucket_lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("bucket_lo"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = sketch
      .select(col("bucket_lo"), col("n"),
        sum(col("n")).over(w).as("__cum"))
      .withColumn("__total", max(col("__cum")).over(wAll))
    val qdf = qs.toDF("q_num", "q_den")
    qdf.crossJoin(cum)
      // ceil(num*N/den) in exact INTEGER arithmetic — `div`, not `/`
      // (long / long is IEEE double division in Spark)
      .withColumn("__rank", expr("(q_num * __total + q_den - 1) div q_den"))
      .where(col("__cum") >= col("__rank") &&
        col("__cum") - col("n") < col("__rank"))
      .select(col("q_num"), col("q_den"), col("__rank").as("rank"),
        col("bucket_lo").as("est_lo"),
        bucketHi(col("bucket_lo"), subBits).as("est_hi"))
  }

  /** Exact rank-th smallest (1-based) of a positive-long column — the
    * verification twin of [[estimate]] (a full sort at scale; used by gates
    * and tests, not the production path).
    */
  def exactRank(df: DataFrame, valueCol: Column, rank: Long): Long = {
    require(rank >= 1 && rank <= Int.MaxValue,
      s"exactRank is the bounded verification twin; rank must fit an Int, got $rank")
    val v = valueCol.cast("bigint")
    df.where(v.isNotNull && v > 0).select(v.as("__v"))
      .orderBy(col("__v")).limit(rank.toInt)
      .agg(max(col("__v"))).collect()(0).getLong(0)
  }

  /** Per-group sketch: one row per (group, occupied bucket). The group
    * column count multiplies the bounded bucket cardinality, so the result
    * stays a sketch — `n_groups * 64 * 2^subBits` rows — and the build is
    * still ONE hash aggregation with map-side partial combine.
    */
  def sketchBy(df: DataFrame, groupCol: Column, valueCol: Column,
      subBits: Int = 4): DataFrame = {
    val v = valueCol.cast("bigint")
    df.where(v.isNotNull && v > 0)
      .select(groupCol.as("grp"), bucketLo(v, subBits).as("bucket_lo"))
      .groupBy(col("grp"), col("bucket_lo"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-group quantile q = num/den off a [[sketchBy]] result: for each
    * group, (grp, rank, est_lo, est_hi) with the same rank convention and
    * error guarantee as [[estimate]]. The running sum partitions by group
    * over the bounded per-group bucket list — no unbounded-group skew is
    * possible because the window's partition size is capped by the sketch
    * bound, not by the data.
    */
  def estimateBy(sketch: DataFrame, num: Long, den: Long,
      subBits: Int = 4): DataFrame = {
    require(num > 0 && num <= den, s"quantile must satisfy 0 < num <= den, got $num/$den")
    val w = Window.partitionBy(col("grp")).orderBy(col("bucket_lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sketch
      .select(col("grp"), col("bucket_lo"), col("n"),
        sum(col("n")).over(w).as("__cum"))
      .withColumn("__total", max(col("__cum")).over(wAll))
      .withColumn("__rank",
        expr(s"(${num}L * __total + ${den}L - 1) div ${den}L"))
      .where(col("__cum") >= col("__rank") &&
        col("__cum") - col("n") < col("__rank"))
      .select(col("grp"), col("__rank").as("rank"),
        col("bucket_lo").as("est_lo"),
        bucketHi(col("bucket_lo"), subBits).as("est_hi"))
  }

  /** Sketch-driven per-group threshold filter: keep rows whose value is at
    * least the group's estimated q = num/den bucket floor (`est_lo`) — e.g.
    * "drop each language's shortest quarter" with num/den = 1/4. The CCNet
    * shape: per-group cutoffs come from the sketch (one aggregation, tiny
    * state), then ONE broadcast join + filter over the corpus — never a
    * per-group rank window over 100 TB of rows. Guarantee: since the true
    * quantile lies in [est_lo, est_hi], filtering at est_lo keeps every row
    * above the true quantile (errs on the keep side, never over-deletes).
    */
  def thresholdFilter(df: DataFrame, groupCol: Column, valueCol: Column,
      num: Long, den: Long, subBits: Int = 4): DataFrame = {
    val cutoffs = estimateBy(sketchBy(df, groupCol, valueCol, subBits),
      num, den, subBits)
    df.join(broadcast(cutoffs.select(col("grp"), col("est_lo"))),
        groupCol === col("grp"))
      .where(valueCol.cast("bigint") >= col("est_lo"))
      .drop("grp", "est_lo")
  }
}
