package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway micro-bench: three formulations of ordered per-doc line
  * reassembly (the t53/t75/t85 tail pattern).
  */
object ReassembleBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
    val lines = docs
      .select(col("doc_id").as("id"), split(col("text"), " ").as("__ls"))
      .select(col("id"), posexplode(col("__ls")).as(Seq("__pos", "__line")))
    def run(name: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        println(f"$name pass $i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    run("hof_transform_array_sort") {
      lines.groupBy(col("id")).agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line"))).as("t"),
        count(lit(1)).as("n"))
    }
    run("sort_array_getfield") {
      lines.groupBy(col("id")).agg(
        concat_ws(" ",
          sort_array(collect_list(struct(col("__pos"), col("__line"))))
            .getField("__line")).as("t"),
        count(lit(1)).as("n"))
    }
    run("window_ordered_collect") {
      val w = Window.partitionBy(col("id")).orderBy(col("__pos"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      lines
        .withColumn("__arr", collect_list(col("__line")).over(w))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("__pos"))))
        .where(col("__rn") === 1)
        .select(col("id"), concat_ws(" ", col("__arr")).as("t"),
          size(col("__arr")).cast("bigint").as("n"))
    }
    spark.stop()
  }
}
