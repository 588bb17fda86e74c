package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every build-side key passes the probe expression") {
    // This is the build/probe hash-parity proof: the driver-side twin sets
    // the bits, the codegen'd column expression reads them — one mismatched
    // bit anywhere and some member fails the membership test.
    val keys = spark.range(0, 2000).select((col("id") * 7919 + 13).as("k"))
    val bloom = BloomJoin.build(keys, col("k"))
    val missed = keys.where(!BloomJoin.mightContain(bloom, col("k"))).count()
    assert(missed == 0)
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
