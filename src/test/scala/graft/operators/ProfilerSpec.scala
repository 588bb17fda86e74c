package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("b"), None),
    (3L, None, Some(30.0)),
    (4L, Some("a"), Some(30.0))).toDF("id", "tag", "score")

  test("profile: exact stats per column from one frame, long format") {
    val got = Profiler.profile(df, Seq("tag", "score"))
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)))).toSeq
    assert(got == Seq(
      ("score", 4L, 1L, 2L, Some("10.0"), Some("30.0")),
      ("tag", 4L, 1L, 2L, Some("a"), Some("b"))))
  }

  test("profile plans a single scan of the input (no per-column re-read)") {
    val plan = Profiler.profile(df, Seq("tag", "score", "id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "per-column union would re-scan the table")
  }

  test("profile handles hostile column names (dots, backticks, quotes)") {
    val h = Seq((1L, "x"), (2L, "y")).toDF("id", "a`b.c'd\"e")
    val got = Profiler.profile(h, Seq("a`b.c'd\"e")).collect().head
    assert(got.getString(0) == "a`b.c'd\"e")
    assert(got.getLong(1) == 2L && got.getLong(2) == 0L && got.getLong(3) == 2L)
    assert(got.getString(4) == "x" && got.getString(5) == "y")
  }

  test("distributionDrift: hand-computed shares and total-variation distance") {
    val before = Seq("a", "a", "a", "b").toDF("tag")
    val after = Seq("a", "b", "b", "b").toDF("tag")
    val got = Profiler.distributionDrift(before, after, Seq("tag" -> col("tag")))
      .orderBy("value").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("a", "b"))
    val a = got(0)
    assert(a.getLong(2) == 3L && a.getLong(3) == 1L)
    assert(a.getDouble(4) == 0.75 && a.getDouble(5) == 0.25)
    assert(a.getDouble(6) == -0.5)
    // TV = (|1/4-3/4| + |3/4-1/4|) / 2 = 0.5 — exact in doubles
    assert(got.forall(_.getDouble(7) == 0.5))
  }

  test("distributionDrift: identical snapshots read zero; disjoint read one") {
    val x = Seq("a", "b", "c").toDF("tag")
    val same = Profiler.distributionDrift(x, x, Seq("tag" -> col("tag"))).collect()
    assert(same.forall(r => r.getDouble(6) == 0.0 && r.getDouble(7) == 0.0))
    val disjoint = Profiler.distributionDrift(
      Seq("a", "a").toDF("tag"), Seq("b", "b").toDF("tag"),
      Seq("tag" -> col("tag"))).orderBy("value").collect()
    assert(disjoint.forall(_.getDouble(7) == 1.0), "disjoint supports: TV = 1")
    // one-sided categories carry a zero count, not a dropped row
    assert(disjoint.map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      == Seq(("a", 2L, 0L), ("b", 0L, 2L)))
  }

  test("distributionDrift: nulls fold into a counted category; empty side guards") {
    val before = Seq(Some("a"), None, None).toDF("tag")
    val after = Seq(Some("a"), None).toDF("tag")
    val got = Profiler.distributionDrift(before, after, Seq("tag" -> col("tag")))
      .orderBy("value").collect()
    val nullRow = got.find(_.getString(1) == "(null)").get
    assert(nullRow.getLong(2) == 2L && nullRow.getLong(3) == 1L)
    val empty = Profiler.distributionDrift(
      before, before.limit(0), Seq("tag" -> col("tag"))).collect()
    assert(empty.forall(r => r.isNullAt(5) && r.isNullAt(7)),
      "empty side: shares/tv null, never a division by zero")
  }

  test("log2Bucket: top-5-bit buckets as exact integers, null below one") {
    val got = Seq(101L, 31L, 32L, 1000L, 0L).toDF("v")
      .select(Profiler.log2Bucket(col("v"))).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    // 101 = 1100101b (7 bits, s=2) -> 100; 31 (5 bits, s=0) -> 31;
    // 32 (6 bits, s=1) -> 32; 1000 = 1111101000b (10 bits, s=5) -> 992
    assert(got == Seq(Some(100L), Some(31L), Some(32L), Some(992L), None))
  }

  test("drift: null-rate jump and schema drift are both visible") {
    val before = Seq((1L, Some("x")), (2L, Some("y"))).toDF("id", "tag")
    val after = Seq((1L, None: Option[String]), (2L, Some("y")))
      .toDF("id", "tag").withColumn("extra", lit(1))
    val got = Profiler.drift(before, after, Seq("tag", "extra"))
      .orderBy("column").collect()
    val tag = got.find(_.getString(0) == "tag").get
    assert(math.abs(tag.getAs[Double]("null_rate_delta") - 0.5) < 1e-12)
    val extra = got.find(_.getString(0) == "extra").get
    assert(extra.isNullAt(extra.fieldIndex("rows_before")), "schema drift row")
  }

  test("filterImpact: per-group mix shares before vs after a predicate, hand-computed") {
    val df = Seq(
      ("en", 10L, true), ("en", 30L, false),
      ("de", 20L, true), ("de", 20L, true),
      ("zh", 5L, false)
    ).toDF("lang", "w", "ok")
    // totals: 85 tokens before, 50 kept
    val got = Profiler.filterImpact(df, col("lang"), col("ok"), col("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    val en = got("en")
    assert(en.getAs[Long]("docs_before") == 2 && en.getAs[Long]("docs_kept") == 1
      && en.getAs[Long]("docs_removed") == 1)
    assert(en.getAs[Long]("tokens_before") == 40 && en.getAs[Long]("tokens_kept") == 10
      && en.getAs[Long]("tokens_removed") == 30)
    assert(en.getAs[Double]("doc_keep_rate") == 0.5
      && en.getAs[Double]("token_keep_rate") == 0.25)
    assert(en.getAs[Double]("share_before") == 40.0 / 85.0
      && en.getAs[Double]("share_after") == 10.0 / 50.0)
    assert(en.getAs[Double]("share_delta") == 10.0 / 50.0 - 40.0 / 85.0)
    val zh = got("zh") // fully filtered: share_after is a real 0, not null
    assert(zh.getAs[Long]("tokens_kept") == 0L
      && zh.getAs[Double]("share_after") == 0.0
      && zh.getAs[Double]("share_delta") == -(5.0 / 85.0))
    // predicate false everywhere: kept totals zero, shares-after null,
    // delta collapses to -share_before (never a division by zero)
    val none = Profiler.filterImpact(df, col("lang"), lit(false), col("w")).collect()
    assert(none.forall(r => r.getAs[Long]("tokens_kept") == 0L
      && r.isNullAt(r.fieldIndex("share_after"))))
    // a NULL predicate value counts as removed (CASE WHEN semantics both engines)
    val nullish = Profiler.filterImpact(df, col("lang"),
      when(col("lang") === "en", lit(true)), col("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(nullish("en").getAs[Long]("docs_kept") == 2L
      && nullish("de").getAs[Long]("docs_kept") == 0L)
  }
}
