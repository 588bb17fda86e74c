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
    // Noise robustness: N full timed sweeps (default 3), report the per-query
    // MEDIAN across sweeps (and the min, as the contention-free floor).
    // Sweeps are interleaved (sweep 1 runs every query, then sweep 2, ...)
    // so a transient contention window on a shared box degrades one pass of
    // several queries — which the per-query median then discards — instead of
    // all passes of a single query. SPARK_GRAFT_BENCH_PASSES overrides.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt)
    val ordered = selected.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (pass <- 1 to passes; (name, fn) <- ordered) {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name pass $pass: $e") }
      samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val med = ordered.map { case (name, _) => name -> median(samples(name)) }
    val mins = ordered.map { case (name, _) => name -> samples(name).min }
    def jsonObj(kvs: Seq[(String, Double)], fmt: Double => String): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = if (med.nonEmpty) med.map(_._2).sum else 0.0
    val totalMin = if (mins.nonEmpty) mins.map(_._2).sum else 0.0
    // Full-precision detail (per-query medians AND mins, pass count) goes to
    // stderr with a non-JSON prefix: useful to humans, impossible for the
    // driver to mistake for the contract line.
    System.err.println(s"""bench-detail {"total":$total,"queries":${jsonObj(med, _.toString)},"queries_min":${jsonObj(mins, _.toString)},"total_min":$totalMin,"passes":$passes,"sf":"$sfDir"}""")
    // The contract line must be (a) unprefixed — see run/outputStrategy in
    // build.sbt — and (b) short enough to survive the driver's 2000-char
    // stdout tail INCLUDING sbt's trailing "[success] Total time: ..." line
    // (~110 chars). Rounded per-query values keep ~72 queries under ~1750
    // chars; if the registry grows past the budget, drop to 2 decimals.
    def compact(decimals: Int)(v: Double): String = {
      val s = String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))
      if (decimals == 0) s // "0" has no trailing-zero fraction to trim
      else {
        val t = s.reverse.dropWhile(_ == '0').reverse
        if (t.endsWith(".")) t + "0" else t
      }
    }
    // "sf":0.1 (parsed from the dir name) is 18 chars cheaper than the path.
    val sfToken = "sf([0-9.]+)/*$".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("\"" + sfDir + "\"")
    def line(kvs: Seq[(String, Double)])(decimals: Int): String =
      s"""{"metric":"total","value":${compact(3)(total)},"unit":"sec","queries":${jsonObj(kvs, compact(decimals))},"sf":$sfToken}"""
    // Past ~95 queries the full-name dict exceeds the tail budget even at
    // 0 decimals (long names like t32_dup_components_stars dominate), so the
    // ladder gains a rung BEFORE dropping coverage: the qNN/tNN prefix is
    // unique across the registry and shrinks each entry ~3x. Full names at
    // full precision always remain on the bench-detail stderr line.
    val shortMed = med.map { case (k, v) => k.takeWhile(_ != '_') -> v }
    val shortOk = shortMed.map(_._1).distinct.size == med.size
    val candidates =
      Seq(3, 2, 1, 0).map(line(med)) ++
        (if (shortOk) Seq(3, 2, 1, 0).map(line(shortMed)) else Nil)
    // 1850 ≈ 2000-char tail minus sbt's "[success] Total time: ..." trailer;
    // degrade precision, then key length, never per-query coverage.
    val out = candidates.find(_.length <= 1850)
      .getOrElse(candidates.last)
    println(out)
    spark.stop()
  }
}
