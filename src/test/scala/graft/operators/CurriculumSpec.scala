package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("bucketBy quartiles: hand-computed cut points, ties to the lower bucket") {
    // scores 1..8: interior quartile ORDER STATISTICS sit at 0-based ranks
    // floor(7i/4) = 1/3/5 -> cuts 2/4/6 -> buckets: 1,2 | 3,4 | 5,6 | 7,8
    // (ties to the lower bucket via strict <)
    val df = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val got = Curriculum.bucketBy(df, col("score"), 4)
      .orderBy("id").select("bucket").as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L))
  }

  test("bucketBy: a score equal to a cut point lands in the lower bucket") {
    // scores 0,10,20,30,40: median cut = order statistic at rank
    // (5-1)*1/2 = 2 -> the value 20 itself; strict < sends the 20-row DOWN
    val df = Seq(0.0, 10.0, 20.0, 30.0, 40.0).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "score")
    val got = Curriculum.bucketBy(df, col("score"), 2)
      .orderBy("id").select("bucket").as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 0L, 1L, 1L))
  }

  test("bucketBy: NaN scores get null buckets and are excluded from the cuts") {
    val df = Seq((1L, 1.0), (2L, Double.NaN), (3L, 2.0), (4L, 3.0), (5L, 4.0))
      .toDF("id", "score")
    val got = Curriculum.bucketBy(df, col("score"), 2).orderBy("id").collect()
    // NaN has no quantile: null bucket, same as a null score
    assert(got(1).isNullAt(got(1).fieldIndex("bucket")))
    // cuts come from {1,2,3,4} only: rank (4-1)*1/2 = 1 -> cut 2.0 (ties down)
    val rest = got.filter(!_.isNullAt(2)).map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rest == Map(1L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
  }

  test("bucketBy: null scores get null buckets; bucket count respected") {
    val df = Seq((1L, Some(1.0)), (2L, None), (3L, Some(100.0))).toDF("id", "score")
    val got = Curriculum.bucketBy(df, col("score"), 3).orderBy("id").collect()
    assert(got(1).isNullAt(got(1).fieldIndex("bucket")))
    val buckets = got.filter(!_.isNullAt(2)).map(_.getLong(2)).toSet
    assert(buckets.subsetOf(Set(0L, 1L, 2L)))
  }
}
