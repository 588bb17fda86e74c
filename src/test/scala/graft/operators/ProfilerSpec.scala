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
}
