package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-20 optimization probe: run one registry query and attribute its
  * wall clock to Spark jobs (callsite + duration), so gate-internal phases
  * (k-means fits, index writes, verdict counts) are measured instead of
  * guessed. Usage:
  *   sbt "runMain graft.tools.OptProbe <sfDir> <queryName> [passes]"
  * Prints one line per job over 50 ms plus a per-callsite rollup.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val exec = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .getOrElse("-")
        val tasks = js.stageInfos.map(_.numTasks).sum
        val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), s"$site [exec=$exec tasks=$tasks]"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          rows.synchronized {
            rows += ((je.jobId, (System.nanoTime() - t0) / 1e9, site))
          }
        }
      }
    })

    for (name <- names; fn = graft.SparkEntry.queries(name); p <- 1 to passes) {
      rows.synchronized(rows.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      val snap = rows.synchronized(rows.toVector)
      println(f"== $name pass $p: $total%.2f s, ${snap.size} jobs, " +
        f"job-sum ${snap.map(_._2).sum}%.2f s")
      snap.filter(_._2 >= 0.05).sortBy(-_._2).take(40).foreach { case (id, s, site) =>
        println(f"  job $id%4d $s%7.3f s  $site")
      }
      println("  -- rollup by callsite --")
      snap.groupBy(_._3.takeWhile(_ != '[')).map {
        case (site, g) => (g.map(_._2).sum, g.size, site)
      }.toSeq.sortBy(-_._1).take(25).foreach { case (s, n, site) =>
        println(f"  $s%8.3f s  n=$n%-4d $site")
      }
      // drop persisted state between passes like the bench gate loop does
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
