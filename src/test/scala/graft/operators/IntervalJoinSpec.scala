package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq((1L, 5L), (2L, 100L), (3L, 250L), (4L, -30L), (5L, 1000L))
  private val intervals = Seq(
    (10L, 0L, 10L),      // catches pt 5
    (11L, 90L, 260L),    // catches 100 and 250 (spans multiple buckets)
    (12L, -100L, -10L),  // negative range, catches -30
    (13L, 240L, 240L),   // zero-length, catches nothing (250 outside)
    (14L, 250L, 250L),   // zero-length, catches exactly 250
    (15L, 400L, 300L))   // inverted: matches nothing

  private def run(width: Long) = {
    val p = points.toDF("pid", "pt")
    val iv = intervals.toDF("iid", "lo", "hi")
    IntervalJoin.pointInInterval(p, $"pt", iv, $"lo", $"hi", width)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
  }

  private val expected = Set((1L, 10L), (2L, 11L), (3L, 11L), (4L, 12L), (3L, 14L))

  test("inclusive matches, multi-bucket spans, negatives, zero-length, inverted intervals") {
    assert(run(64) == expected)
  }

  test("result is bucket-width invariant, with each pair emitted exactly once") {
    for (w <- Seq(1L, 7L, 100L, 100000L)) {
      val p = points.toDF("pid", "pt")
      val iv = intervals.toDF("iid", "lo", "hi")
      val rows = IntervalJoin.pointInInterval(p, $"pt", iv, $"lo", $"hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      assert(rows.toSet == expected && rows.size == expected.size, s"width $w")
    }
  }

  test("matches a naive inequality join on the real events table") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .withColumn("sec", unix_timestamp($"ts"))
    val p = ev.where($"event_type" === "purchase").select($"event_id".as("pid"), $"sec".as("pt"))
    val iv = ev.where($"event_type" === "signup")
      .select($"event_id".as("iid"), $"sec".as("lo"), ($"sec" + 300 + ($"event_id" % 7) * 600).as("hi"))
    val fast = IntervalJoin.pointInInterval(p, $"pt", iv, $"lo", $"hi", 1800L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = p.join(iv, $"pt" >= $"lo" && $"pt" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("the plan is an equi-join on the bucket — no nested loop, no cartesian") {
    val p = points.toDF("pid", "pt")
    val iv = intervals.toDF("iid", "lo", "hi")
    val plan = IntervalJoin.pointInInterval(p, $"pt", iv, $"lo", $"hi", 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}
