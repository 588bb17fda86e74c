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
  * The probe is pure built-in bit arithmetic (xxhash64 + shifts over an
  * array literal), so it rides whole-stage codegen; double hashing
  * (Kirsch–Mitzenmacher) derives the k probe positions from two 31-bit
  * halves, keeping every intermediate far from Long overflow under ANSI
  * arithmetic.
  */
object BloomJoin {

  /** An immutable bloom filter over long keys: `numBits` is rounded up to a
    * power of two so the position reduction is a mask, not a modulo.
    */
  final case class Bloom(bits: Array[Long], numBits: Int, k: Int)

  private def nextPow2(n: Int): Int = Integer.highestOneBit(math.max(2, n - 1)) * 2

  /** Builds the filter from the build side's distinct keys.
    *
    * The keys are collected to the driver — same size contract as a
    * broadcast dim (the point of a bloom filter is that the BITS are small;
    * the build happens where the keys already are). For a build side too
    * large to collect, aggregate the k bit positions distributedly and
    * collect only the set positions; the probe side is unchanged.
    */
  def build(keys: DataFrame, key: Column, bitsPerKey: Int = 16, k: Int = 5): Bloom = {
    val ks = keys.select(key.cast("bigint").as("k")).where(col("k").isNotNull)
      .distinct().collect().map(_.getLong(0))
    val numBits = nextPow2(math.max(64, ks.length * bitsPerKey))
    val words = new Array[Long](numBits / 64)
    ks.foreach { v =>
      val (h1, h2) = hashes(v)
      var i = 0
      while (i < k) {
        val pos = ((h1 + i.toLong * h2) & (numBits - 1)).toInt
        words(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    Bloom(words, numBits, k)
  }

  /** Driver-side twin of the column-expression probe hashes: two 31-bit
    * values (h2 forced odd so the k probe positions stride the whole
    * table). `functions.xxhash64(a, b)` folds its arguments sequentially
    * from the fixed seed 42 — `hash(b, hash(a, 42))` — and the twin mirrors
    * that fold exactly, bit for bit (BloomJoinSpec pins the parity).
    */
  private val SecondSeed: Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      1042L, org.apache.spark.sql.types.LongType, 42L)

  private def hashes(v: Long): (Long, Long) = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.LongType
    val h1 = XxHash64Function.hash(v, LongType, 42L) >>> 33
    val h2 = (XxHash64Function.hash(v, LongType, SecondSeed) >>> 33) | 1L
    (h1, h2)
  }

  /** Membership-test column: true iff all k probe bits are set. */
  def mightContain(bloom: Bloom, key: Column): Column = {
    val words = typedlit(bloom.bits.toSeq)
    val kc = key.cast("bigint")
    val h1 = shiftrightunsigned(xxhash64(kc), 33)
    val h2 = shiftrightunsigned(xxhash64(lit(1042L), kc), 33).bitwiseOR(lit(1L))
    (0 until bloom.k).map { i =>
      val pos = (h1 + lit(i.toLong) * h2).bitwiseAND(lit((bloom.numBits - 1).toLong))
      val word = element_at(words, shiftrightunsigned(pos, 6).cast("int") + 1)
      // dynamic shift amount needs the SQL signature (the Scala helper only
      // takes a literal Int)
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
