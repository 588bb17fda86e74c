package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `rightTime <= leftTime` within the same key (the standard time-series
  * enrichment join; DuckDB/Pandas call it ASOF).
  *
  * Spark lacks the operator; per SURVEY §7.2's preference order this is
  * option (a) — composed from built-ins, no custom SparkPlan needed:
  * union both sides tagged, sort per key by (time, side, order), carry the
  * last right payload forward with `last(_, ignoreNulls)` over an unbounded
  * preceding frame, keep left rows. The payload travels as ONE struct so a
  * match is all-or-nothing (independent column carry could mix right rows).
  * One shuffle on the key — the cost shape of a sort-merge join, AQE-managed
  * at scale. Ties: a right row at exactly leftTime matches (side ordering
  * puts right first); duplicate right timestamps resolve to the largest
  * `rightOrder`.
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      rightOrder: String): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._

    val leftCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct.as("p")).schema("p").dataType

    val l = left
      .select((Seq(col(key).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
        lit(Long.MaxValue).as("_ord"),
        lit(null).cast(payloadType).as("_p")) ++
        leftCols.map(c => col(c).as(s"_l_$c"))): _*)
    val r = right
      .select((Seq(col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
        col(rightOrder).cast("long").as("_ord"),
        payloadStruct.as("_p")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c"))): _*)

    val w = Window.partitionBy($"_k")
      .orderBy($"_t", $"_side", $"_ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last($"_p", ignoreNulls = true).over(w))
      .filter($"_side" === 1)
      .select((leftCols.map(c => col(s"_l_$c").as(c)) ++
        rightPayload.map(c => col("_match").getField(c).as(s"asof_$c"))): _*)
  }
}
