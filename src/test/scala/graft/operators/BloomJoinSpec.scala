package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every build-side key passes the probe expression") {
    // Build and probe share the position expressions, so this pins the
    // distributed bit aggregation end-to-end: every bit a build row sets
    // must be found by the probe's word/shift arithmetic.
    val keys = spark.range(0, 2000).select((col("id") * 7919 + 13).as("k"))
    val bloom = BloomJoin.build(keys, col("k"))
    val missed = keys.where(!BloomJoin.mightContain(bloom, col("k"))).count()
    assert(missed == 0)
  }

  test("distributed build at 1M keys: no false negatives, driver holds only the bits") {
    // A build side well past comfortable-collect territory: the driver-side
    // artifact is numBits/64 longs regardless of key count.
    val keys = spark.range(0, 1000000).select((col("id") * 31 + 7).as("k"))
    val bloom = BloomJoin.build(keys, col("k"), bitsPerKey = 12, k = 4)
    assert(bloom.bits.length.toLong * 64 <= BloomJoin.MaxBits)
    val missed = keys.where(!BloomJoin.mightContain(bloom, col("k"))).count()
    assert(missed == 0)
  }

  test("sizing arithmetic stays in Long territory (no Int-overflow collapse to 64 bits)") {
    // 10M synthetic keys * 16 bits would already be >Int.MaxValue/13; the
    // cap keeps the table at MaxBits instead of wrapping negative.
    val keys = spark.range(0, 300000).select(col("id").as("k"))
    val bloom = BloomJoin.build(keys, col("k"), bitsPerKey = 16, k = 5)
    assert(bloom.numBits >= 64 && (bloom.numBits & (bloom.numBits - 1)) == 0)
    assert(bloom.numBits.toLong <= BloomJoin.MaxBits)
  }

  test("false-positive rate is bounded at the configured bits-per-key") {
    val keys = spark.range(0, 5000).select(col("id").as("k"))
    val bloom = BloomJoin.build(keys, col("k"), bitsPerKey = 16, k = 5)
    val probes = spark.range(1000000, 1050000).select(col("id").as("k"))
    val fp = probes.where(BloomJoin.mightContain(bloom, col("k"))).count()
    // 16 bits/key with 5 hashes gives well under 1% theoretical FPR; allow 2%
    assert(fp < 1000, s"false positives: $fp / 50000")
  }

  test("semiJoin equals the plain semi join and prunes before it") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .where(col("c_mktsegment") === "BUILDING")
    val got = BloomJoin.semiJoin(orders, col("o_custkey"), cust, col("c_custkey"))
    // the USING join moves the key column first — realign before exceptAll,
    // which compares by position
    val expected = orders.join(cust.select(col("c_custkey").as("o_custkey")).distinct(),
      Seq("o_custkey"), "left_semi").select(got.columns.map(col).toSeq: _*)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)

    // the prefilter itself must genuinely prune (fewer rows than the full
    // probe side) while keeping every true match
    val bloom = BloomJoin.build(cust, col("c_custkey"))
    val pref = orders.where(BloomJoin.mightContain(bloom, col("o_custkey")))
    assert(pref.count() < orders.count())
    assert(pref.count() >= expected.count())
  }
}
