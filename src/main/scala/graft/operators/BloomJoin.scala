package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: probe-side rows that cannot possibly match the
  * build side are dropped BEFORE the join's shuffle/broadcast, for the price
  * of shipping a bit array instead of the build side's key set.
  *
  * At 100 TB this is the standard runtime-filter pattern (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` applies it inside the
  * optimizer when statistics allow): a 10^8-row build side fits in a few MB
  * of bloom bits at 1% FPR, and the probe-side scan then discards the vast
  * majority of a fact table's rows pre-shuffle. The filter is one-sided —
  * false positives survive the prefilter and are removed by the exact join
  * that follows, so the composed operator is exactly a semi join (that
  * equivalence is the registry oracle).
  *
  * The BUILD is fully distributed: each build row's k probe positions are
  * computed by the same codegen'd column expressions the probe uses, OR'd
  * into 64-bit words by a map-side-combining aggregation, and only the final
  * word table — at most `MaxBits/64` longs, the size of the FILTER, never
  * the size of the build side — reaches the driver. Setting a bit twice is
  * idempotent, so no distinct pass over the keys is needed; the only
  * driver-sized artifact is the bits themselves. Sizing uses an HLL
  * cardinality sketch (partial-merged, no key shuffle).
  *
  * The probe is pure built-in bit arithmetic (xxhash64 + shifts over an
  * array literal), so it rides whole-stage codegen; double hashing
  * (Kirsch–Mitzenmacher) derives the k probe positions from two 31-bit
  * halves, keeping every intermediate far from Long overflow under ANSI
  * arithmetic. Build and probe share the position expressions, so
  * no-false-negatives holds by construction — there is no driver/executor
  * hash twin to drift.
  */
object BloomJoin {

  /** An immutable bloom filter over long keys: `numBits` is rounded up to a
    * power of two so the position reduction is a mask, not a modulo.
    */
  final case class Bloom(bits: Array[Long], numBits: Int, k: Int)

  /** Hard cap on the filter size: 2^27 bits = 16 MB of words. Beyond this
    * the bit table is clamped — FPR degrades gracefully (more probe rows
    * survive to the exact join; output is unaffected, the bloom pass is
    * one-sided by contract) instead of the sizing arithmetic overflowing or
    * the probe literal growing unboundedly.
    */
  val MaxBits: Long = 1L << 27

  private def nextPow2(n: Long): Long =
    java.lang.Long.highestOneBit(math.max(2L, n - 1)) * 2

  /** Two 31-bit probe hashes (h2 forced odd so the k probe positions stride
    * the whole table). `xxhash64(a, b)` folds its arguments sequentially
    * from the fixed seed 42, so the pair is (hash(k, 42), hash(k, hash(1042,
    * 42))) — both build and probe evaluate exactly this expression tree.
    */
  private def probeHashes(key: Column): (Column, Column) = {
    val kc = key.cast("bigint")
    val h1 = shiftrightunsigned(xxhash64(kc), 33)
    val h2 = shiftrightunsigned(xxhash64(lit(1042L), kc), 33).bitwiseOR(lit(1L))
    (h1, h2)
  }

  /** The k bit positions for a key: h1 + i·h2 masked to the table size.
    * h1, h2 < 2^31 and i < k keep every intermediate far below Long range
    * (ANSI-safe).
    */
  private def bitPositions(key: Column, numBits: Int, k: Int): Seq[Column] = {
    val (h1, h2) = probeHashes(key)
    (0 until k).map(i =>
      (h1 + lit(i.toLong) * h2).bitwiseAND(lit((numBits - 1).toLong)))
  }

  /** Builds the filter distributedly: sizing via an HLL sketch, bits via an
    * explode of the k positions per key into a word-indexed `bit_or`
    * aggregation (map-side partials reduce each partition to at most
    * numBits/64 rows before the shuffle). The driver receives only the
    * final word table — the filter itself — so the build side is NOT
    * driver-bounded.
    */
  def build(keys: DataFrame, key: Column, bitsPerKey: Int = 16, k: Int = 5): Bloom = {
    val dk = keys.select(key.cast("bigint").as("k")).where(col("k").isNotNull)
    val approxKeys = dk.agg(approx_count_distinct(col("k"), 0.02).as("n"))
      .collect()(0).getLong(0)
    // Long arithmetic end-to-end: 134M+ keys * bitsPerKey would overflow Int
    // and collapse the table to 64 bits (a silent ~100% FPR).
    val numBits = nextPow2(
      math.min(MaxBits, math.max(64L, approxKeys * bitsPerKey.toLong))).toInt
    val setWords = dk
      .select(explode(array(bitPositions(col("k"), numBits, k): _*)).as("pos"))
      .select(
        shiftrightunsigned(col("pos"), 6).cast("int").as("w"),
        // dynamic shift amount needs the SQL signature (the Scala helper
        // only takes a literal Int)
        call_function("shiftleft", lit(1L), col("pos").bitwiseAND(lit(63L)).cast("int")).as("b"))
      .groupBy(col("w")).agg(bit_or(col("b")).as("word"))
      .collect()
    val words = new Array[Long](numBits / 64)
    setWords.foreach(r => words(r.getInt(0)) = r.getLong(1))
    Bloom(words, numBits, k)
  }

  /** Membership-test column: true iff all k probe bits are set. The word
    * table is embedded as an UnsafeArrayData literal — 8 bytes per word in
    * the serialized task, vs ~56 for a boxed Seq literal (a 2M-word filter
    * would otherwise ship a >100 MB task binary).
    */
  def mightContain(bloom: Bloom, key: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val words = org.apache.spark.sql.GraftColumnBridge.column(
      Literal(ArrayData.toArrayData(bloom.bits), ArrayType(LongType, containsNull = false)))
    bitPositions(key, bloom.numBits, bloom.k).map { pos =>
      val word = element_at(words, shiftrightunsigned(pos, 6).cast("int") + 1)
      call_function("shiftrightunsigned", word, pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** Semi join with bloom prefiltering: exactly `probe SEMI JOIN build` (the
    * bloom pass only removes guaranteed non-matches early; the exact join
    * removes the false positives).
    */
  def semiJoin(probe: DataFrame, probeKey: Column, buildKeys: DataFrame, buildKey: Column,
      bitsPerKey: Int = 16, k: Int = 5): DataFrame = {
    val bloom = build(buildKeys, buildKey, bitsPerKey, k)
    probe.where(mightContain(bloom, probeKey))
      .join(buildKeys.select(buildKey.as("__bk")).distinct(),
        probeKey === col("__bk"), "left_semi")
  }
}
