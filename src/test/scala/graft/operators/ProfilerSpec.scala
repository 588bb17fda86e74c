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
