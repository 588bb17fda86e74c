package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderValue interleaves bits (hand-computed golden values)") {
    // a=0b101 on even positions -> 0b010001; b=0b011 on odd -> 0b001010
    // z(5, 3, 3 bits) = 0b010001 | 0b001010 = 0b011011 = 27
    val rows = Seq((5L, 3L), (0L, 0L), (7L, 7L), (1L, 0L), (0L, 1L))
      .toDF("a", "b")
      .select(Layout.zorderValue(col("a"), col("b"), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(27L, 0L, 63L, 1L, 2L))
  }

  test("zorderValue is monotone-safe at the type level (31-bit max, no overflow)") {
    val max = (1L << 31) - 1
    val z = Seq((max, max)).toDF("a", "b")
      .select(Layout.zorderValue(col("a"), col("b"), 31).as("z"))
      .collect().head.getLong(0)
    assert(z == -1L >>> 2) // 62 set bits
  }

  test("zorderValueN round-robins bits across three dimensions") {
    // (1,1,1): all three bit-0s -> positions 0,1,2 -> 7 at either width.
    // (2,0,1) bits=1: a masked to 1 bit -> 0; c bit0 -> pos 2 -> 4.
    // (2,0,1) bits=2: a bit1 -> pos 1*3+0=3 -> 8; c bit0 -> pos 2 -> 4; = 12.
    val rows = Seq((1L, 1L, 1L), (2L, 0L, 1L)).toDF("a", "b", "c")
    val got = rows.select(
      Layout.zorderValueN(Seq(col("a"), col("b"), col("c")), 1).as("z1"),
      Layout.zorderValueN(Seq(col("a"), col("b"), col("c")), 2).as("z2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((7L, 7L), (4L, 12L)))
  }

  test("zorderWrite keeps per-file ranges narrow on BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_partkey").cast("bigint").as("pk"), col("l_suppkey").cast("bigint").as("sk"))
    Layout.zorderWrite(li, s"$dir/z", col("pk"), col("sk"), numFiles = 8, bits = 12)

    val global = li.agg(
      (max("pk") - min("pk")).as("pr"), (max("sk") - min("sk")).as("sr")).collect().head
    val files = new java.io.File(s"$dir/z").listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 4, s"expected multiple output files, got ${files.length}")
    val ratios = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath).agg(
        (max("pk") - min("pk")).as("pr"), (max("sk") - min("sk")).as("sr")).collect().head
      (r.getLong(0).toDouble / global.getLong(0), r.getLong(1).toDouble / global.getLong(1))
    }
    val avgP = ratios.map(_._1).sum / ratios.length
    val avgS = ratios.map(_._2).sum / ratios.length
    // A single-column sort would give ~1.0 on the other dimension; the
    // z-order layout must stay well below that on BOTH (file skipping works
    // for predicates on either key).
    assert(avgP < 0.6, s"avg partkey range ratio $avgP")
    assert(avgS < 0.6, s"avg suppkey range ratio $avgS")
  }

  test("zorderWrite: max-value rows stay in the top z-bucket (clamped scaling) " +
      "and empty input does not NPE") {
    val dir = java.nio.file.Files.createTempDirectory("zclamp").toString
    // domain deliberately NOT a power of two: FP scaling error would surface
    // at the hi endpoint, and an unclamped mask+1 would wrap hi rows to file 0
    val df = spark.range(0, 100003).select(col("id").as("a"), (lit(100003L) - col("id")).as("b"))
    Layout.zorderWrite(df, s"$dir/z", col("a"), col("b"), numFiles = 8, bits = 16)
    val files = new java.io.File(s"$dir/z").listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    // the max-a row must live in the same file as its z-neighbors (the file
    // containing the max of a), not in the lowest bucket
    val maxA = 100002L
    val fileOfMax = files.filter(f =>
      spark.read.parquet(f.getAbsolutePath).where(col("a") === maxA).count() > 0)
    assert(fileOfMax.length == 1)
    val stats = spark.read.parquet(fileOfMax.head.getAbsolutePath)
      .agg(min("a"), max("a")).collect().head
    assert(stats.getLong(1) == maxA && stats.getLong(0) > 0L,
      s"max row landed in file spanning [${stats.getLong(0)}, ${stats.getLong(1)}]")
    // empty input: bounds row is all-null; must write an empty table, not NPE
    Layout.zorderWrite(df.where(col("a") < 0), s"$dir/empty", col("a"), col("b"), 4)
    assert(spark.read.parquet(s"$dir/empty").count() == 0)
  }

  test("statsPrunedRead skips files whose footer ranges miss the predicate — on either dim") {
    val dir = java.nio.file.Files.createTempDirectory("zskip").toString
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_partkey").cast("bigint").as("pk"), col("l_suppkey").cast("bigint").as("sk"))
    Layout.zorderWrite(li, s"$dir/z", col("pk"), col("sk"), numFiles = 16, bits = 12)

    val pkMax = li.agg(max("pk")).collect().head.getLong(0)
    val skMax = li.agg(max("sk")).collect().head.getLong(0)
    // a ~10%-wide range on each layout dimension must skip files (z-order
    // keeps per-file ranges narrow in BOTH), and the pruned read must equal
    // the full-scan filter exactly
    for ((colName, hi) <- Seq(("pk", pkMax / 10), ("sk", skMax / 10))) {
      val (pruned, keptN, totalN) =
        Layout.statsPrunedRead(spark, s"$dir/z", Seq((colName, 0L, hi)))
      assert(keptN < totalN, s"$colName: no files skipped ($keptN of $totalN)")
      val got = pruned.where(col(colName) <= hi)
      val expected = li.where(col(colName) <= hi)
      assert(got.count() == expected.count())
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    }
    // conjunction of both dims prunes at least as hard as either alone
    val (_, keptBoth, total) = Layout.statsPrunedRead(spark, s"$dir/z",
      Seq(("pk", 0L, pkMax / 10), ("sk", 0L, skMax / 10)))
    assert(keptBoth < total)
  }

  test("hashBucket is [0,100) and hashSplit proportions are near 80/10/10") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val withSplit = docs.select(
      Layout.hashBucket(col("doc_id")).as("bucket"),
      Layout.hashSplit(col("doc_id")).as("split"))
    val bad = withSplit.where(col("bucket") < 0 || col("bucket") >= 100).count()
    assert(bad == 0)
    val n = withSplit.count().toDouble
    val counts = withSplit.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / n - 0.8) < 0.1, counts.toString)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 0)
  }

  test("hashSplit is deterministic and engine-independent (md5-derived)") {
    // java-side recomputation of the same md5-prefix bucket
    def bucketOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100
    }
    val got = spark.range(0, 200)
      .select(col("id"), Layout.hashBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    got.foreach { case (id, b) => assert(b == bucketOf(id), s"id=$id") }
  }

  test("compact rewrites a many-tiny-file directory into few files, content intact") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val src = spark.read.parquet(s"$sf0001/lineitem.parquet")
    src.repartition(64).write.parquet(s"$dir/small")
    val (before, after) = Layout.compact(spark, s"$dir/small", s"$dir/big",
      targetBytes = 512L * 1024)
    assert(before == 64, s"expected 64 input files, saw $before")
    assert(after < 8, s"expected few output files, got $after")
    val out = spark.read.parquet(s"$dir/big")
    assert(out.count() == src.count())
    assert(out.exceptAll(src).isEmpty && src.exceptAll(out).isEmpty)
  }

  test("compact preserves a Hive-partitioned layout and sizes each partition from its own bytes") {
    val dir = java.nio.file.Files.createTempDirectory("compactpart").toString
    val src = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"),
        Layout.hashSplit(col("l_orderkey")).as("split"))
    src.repartition(32).write.partitionBy("split").parquet(s"$dir/small")
    val (before, after) = Layout.compact(spark, s"$dir/small", s"$dir/big",
      targetBytes = 512L * 1024)
    assert(before > after, s"no compaction: $before -> $after")
    // partition directories are mirrored, so read-back re-infers `split`
    val out = spark.read.parquet(s"$dir/big")
    assert(out.columns.toSet == src.columns.toSet)
    val a = out.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = src.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, s"partition counts changed: $a vs $b")
    for (s <- Seq("train", "val", "test") if a.contains(s))
      assert(new java.io.File(s"$dir/big/split=$s").exists(), s"missing partition dir $s")
  }

  /** DROP TABLE plus physical warehouse-dir removal.
    *
    * The catalog is in-memory per JVM but `spark-warehouse/` persists on
    * disk, so a killed run leaves the managed table's DIRECTORY behind while
    * the next JVM's catalog has no entry for it: DROP TABLE IF EXISTS
    * no-ops and saveAsTable then throws LOCATION_ALREADY_EXISTS. That run's
    * cleanup removes the leftover, so the NEXT run passes — a self-healing
    * "flake" (observed round 8: failed in the full suite, passed
    * standalone). Deleting the directory itself makes the test independent
    * of how the previous JVM died.
    */
  private def dropManagedTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripPrefix("//")
    val dir = java.nio.file.Paths.get(wh, name)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("identically-bucketed tables join with zero shuffle") {
    val n = 16
    dropManagedTable("layout_spec_a")
    dropManagedTable("layout_spec_b")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
    Layout.bucketWrite(orders, "layout_spec_a", "o_custkey", n)
    Layout.bucketWrite(customer.withColumnRenamed("c_custkey", "o_custkey"),
      "layout_spec_b", "o_custkey", n)
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = Layout.bucketedJoin(spark, "layout_spec_a", "layout_spec_b", "o_custkey")
        val shuffles = df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty,
          s"bucketed join must be shuffle-free:\n${df.queryExecution.executedPlan.toString.take(1200)}")
        // and it is still the CORRECT join
        val expected = orders.join(
          customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
        assert(df.count() == expected)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      dropManagedTable("layout_spec_a")
      dropManagedTable("layout_spec_b")
    }
  }
}
