package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[Option[Double]], k: Double = 3.0) = {
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    RobustStats.flagOutliers(df, $"x", k).orderBy("id").collect()
      .map(r => (r.getDouble(r.fieldIndex("robust_med")),
        r.getDouble(r.fieldIndex("robust_mad")),
        if (r.isNullAt(r.fieldIndex("is_outlier"))) None
        else Some(r.getBoolean(r.fieldIndex("is_outlier")))))
  }

  test("hand-computed median/MAD; a gross outlier is the only flag") {
    // values 1..9 + 100: lower median = 5, deviations sorted
    // [0,1,1,2,2,3,3,4,4,95] -> MAD (rank 4) = 2; only |100-5| > 3*2
    val got = run(((1 to 9).map(i => Some(i.toDouble)) :+ Some(100.0)))
    assert(got.forall { case (med, mad, _) => med == 5.0 && mad == 2.0 })
    assert(got.map(_._3) sameElements
      ((1 to 9).map(_ => Some(false)) :+ Some(true)))
  }

  test("MAD = 0 degenerates to differs-from-median; equals stay in") {
    val got = run(Seq.fill(9)(Some(5.0)) :+ Some(9.0))
    assert(got.head._1 == 5.0 && got.head._2 == 0.0)
    assert(got.map(_._3) sameElements
      (Seq.fill(9)(Some(false)) :+ Some(true)))
  }

  test("null and NaN scores get a null flag and do not move the statistics") {
    val got = run(Seq(Some(1.0), None, Some(Double.NaN), Some(2.0), Some(3.0)))
    // selections over {1,2,3}: med = 2, deviations {1,0,1} -> MAD = 1
    assert(got.head._1 == 2.0 && got.head._2 == 1.0)
    assert(got(1)._3.isEmpty && got(2)._3.isEmpty)
    assert(got(0)._3 == Some(false) && got(4)._3 == Some(false))
  }

  test("flag set is repartition-invariant (pure function of the data)") {
    val df = (1L to 1000L).map(i => (i, (i % 97).toDouble + (if (i % 250 == 0) 500.0 else 0.0)))
      .toDF("id", "x")
    val a = RobustStats.flagOutliers(df, $"x").filter($"is_outlier")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = RobustStats.flagOutliers(df.repartition(13), $"x").filter($"is_outlier")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b && a == (250L to 1000L by 250).toSet)
  }
}
