package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are tuned for the driver's local[32] single-JVM harness but every
  * knob is the one you would also set on a real cluster: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * partitions sized to the parallelism actually available (not the 200
  * default), UTC session time so results are reproducible across hosts, and
  * TIMESTAMP_MICROS parquet output so downstream readers (including the
  * DuckDB oracle) see standard int64 timestamps instead of INT96.
  */
object GraftSession {

  /** Apply graft defaults to an arbitrary builder (used by Verify/Bench). */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // The driver testdata's events.ts is parquet TIMESTAMP(NANOS) which Spark
    // has no native type for; read it as raw nanosecond longs and convert
    // explicitly (Tables.events).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** `maxTaskFailures` > 1 turns on local-mode task retries (`local[N, F]`)
    * — the cluster default every fault-tolerance claim (e.g. the keyed
    * sink's temp+atomic-rename idempotence) actually runs under.
    */
  def local(cores: Int = 32, appName: String = "graft",
      maxTaskFailures: Int = 1): SparkSession = {
    val master =
      if (maxTaskFailures > 1) s"local[$cores, $maxTaskFailures]" else s"local[$cores]"
    val spark = configure(
      SparkSession
        .builder()
        .master(master)
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
