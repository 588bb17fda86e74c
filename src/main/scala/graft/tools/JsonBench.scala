package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Throwaway micro-bench for the q18 JSON-extraction regression. */
object JsonBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val ev = graft.core.Tables.events(spark, d)
    def run(name: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 5) {
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        println(f"$name pass $i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val schema = StructType(Seq(StructField("k", LongType)))
    run("from_json") {
      ev.select($"event_type", from_json($"props", schema).getField("k").as("k"))
        .groupBy($"event_type")
        .agg(sum($"k").cast("long").as("sum_k"), max($"k").cast("long").as("max_k"),
          count(lit(1)).as("n"))
    }
    run("get_json_object") {
      ev.select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(sum($"k").cast("long").as("sum_k"), max($"k").cast("long").as("max_k"),
          count(lit(1)).as("n"))
    }
    run("regexp_extract") {
      ev.select($"event_type",
        regexp_extract($"props", "\"k\":\\s*(-?\\d+)", 1).cast("long").as("k"))
        .groupBy($"event_type")
        .agg(sum($"k").cast("long").as("sum_k"), max($"k").cast("long").as("max_k"),
          count(lit(1)).as("n"))
    }
    // isolate the scan+agg floor without any JSON work
    run("no_extract_floor") {
      ev.select($"event_type", length($"props").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(sum($"k").cast("long").as("sum_k"), max($"k").cast("long").as("max_k"),
          count(lit(1)).as("n"))
    }
    spark.stop()
  }
}
