package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileHistSpec extends SparkSpec {
  import spark.implicits._

  test("bucketLo/bucketHi keep the top subBits+1 binary digits (hand-computed)") {
    // subBits=2 keeps 3 bits: 37=0b100101 -> lo 0b100000=32, width 8 -> hi 39
    // 7=0b111 (len 3, shift 0) -> [7,7]; 8=0b1000 -> shift 1 -> [8,9]
    val got = Seq(37L, 7L, 8L, 1L, 255L).toDF("v")
      .select(QuantileHist.bucketLo(col("v"), 2).as("lo"))
      .withColumn("hi", QuantileHist.bucketHi(col("lo"), 2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((32L, 39L), (7L, 7L), (8L, 9L), (1L, 1L), (224L, 255L)))
  }

  test("every value lands inside its own bucket and width obeys the relative bound") {
    val df = spark.range(1, 5000).select(col("id").as("v"))
    val checked = df.select(col("v"),
      QuantileHist.bucketLo(col("v"), 4).as("lo"))
      .withColumn("hi", QuantileHist.bucketHi(col("lo"), 4))
    assert(checked.where(col("v") < col("lo") || col("v") > col("hi")).count() == 0)
    assert(checked.where(col("hi") - col("lo") > col("lo") / 16).count() == 0)
  }

  test("sketch merge is cellwise and bit-identical to sketching the union") {
    val a = spark.range(1, 3000).select((col("id") * 7 % 5000 + 1).as("v"))
    val b = spark.range(1, 2000).select((col("id") * 13 % 800 + 1).as("v"))
    val whole = QuantileHist.sketch(a.union(b), col("v"))
    val merged = QuantileHist.merge(
      QuantileHist.sketch(a, col("v")), QuantileHist.sketch(b, col("v")))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("estimate brackets the exact order statistic for every quantile") {
    // skewed long-tail: mostly small values, a few huge — the shape the
    // exponential buckets exist for
    val df = spark.range(1, 2001).select(
      when(col("id") % 100 === 0, col("id") * 10000).otherwise(col("id") % 97 + 1).as("v"))
    val sk = QuantileHist.sketch(df, col("v"))
    val qs = Seq((1L, 100L), (1L, 4L), (1L, 2L), (3L, 4L), (99L, 100L), (1L, 1L))
    val est = QuantileHist.estimate(sk, qs).collect()
    assert(est.length == qs.length)
    est.foreach { r =>
      val exact = QuantileHist.exactRank(df, col("v"), r.getAs[Long]("rank"))
      val (lo, hi) = (r.getAs[Long]("est_lo"), r.getAs[Long]("est_hi"))
      assert(exact >= lo && exact <= hi,
        s"rank ${r.getAs[Long]("rank")}: exact $exact outside [$lo, $hi]")
    }
    // q = 1/1 is the maximum: its bucket must contain the true max
    val mx = df.agg(max("v")).collect()(0).getLong(0)
    val last = est.find(_.getAs[Long]("q_den") == 1L).get
    assert(mx >= last.getAs[Long]("est_lo") && mx <= last.getAs[Long]("est_hi"))
  }

  test("nulls and non-positives are dropped, not bucketed") {
    val df = Seq[Option[Long]](Some(5L), None, Some(0L), Some(-3L), Some(9L))
      .toDF("v")
    val sk = QuantileHist.sketch(df, col("v")).collect()
    assert(sk.map(_.getLong(1)).sum == 2L)
  }

  test("sketchBy per group equals independent per-group sketches") {
    val df = spark.range(1, 3001).select(
      (col("id") % 3).cast("string").as("g"),
      (col("id") * 17 % 900 + 1).as("v"))
    val grouped = QuantileHist.sketchBy(df, col("g"), col("v"))
    (0 until 3).foreach { g =>
      val solo = QuantileHist.sketch(df.where(col("g") === g.toString), col("v"))
      val slice = grouped.where(col("grp") === g.toString)
        .select(col("bucket_lo"), col("n"))
      assert(solo.exceptAll(slice).isEmpty && slice.exceptAll(solo).isEmpty,
        s"group $g sketch mismatch")
    }
  }

  test("estimateBy brackets each group's exact order statistic") {
    val df = spark.range(1, 2001).select(
      when(col("id") % 2 === 0, "even").otherwise("odd").as("g"),
      when(col("id") % 50 === 0, col("id") * 1000).otherwise(col("id") % 83 + 1).as("v"))
    val est = QuantileHist.estimateBy(
      QuantileHist.sketchBy(df, col("g"), col("v")), 1L, 4L).collect()
    assert(est.length == 2)
    est.foreach { r =>
      val g = r.getAs[String]("grp")
      val exact = QuantileHist.exactRank(
        df.where(col("g") === g), col("v"), r.getAs[Long]("rank"))
      assert(exact >= r.getAs[Long]("est_lo") && exact <= r.getAs[Long]("est_hi"),
        s"group $g: exact $exact outside bucket")
    }
  }

  test("thresholdFilter keeps everything at or above each group's cutoff bucket") {
    val df = spark.range(1, 1001).select(
      (col("id") % 4).cast("string").as("g"), (col("id") % 199 + 1).as("v"))
    val cut = QuantileHist.estimateBy(
      QuantileHist.sketchBy(df, col("g"), col("v")), 1L, 4L)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("est_lo")).toMap
    val kept = QuantileHist.thresholdFilter(df, col("g"), col("v"), 1L, 4L)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("v")))
    assert(kept.nonEmpty)
    // exactly the rows >= their group's est_lo survive — no more, no less
    val expected = df.collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("v")))
      .filter { case (g, v) => v >= cut(g) }
    assert(kept.sorted.toSeq == expected.sorted.toSeq)
    // the filter errs on the keep side: at least 1 - q of each group remains
    val total = df.count()
    assert(kept.length >= (total * 3) / 4 - cut.size * 200,
      s"over-deletion: kept ${kept.length} of $total")
  }
}
