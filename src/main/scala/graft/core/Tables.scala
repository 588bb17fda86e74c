package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * All loaders are plain `spark.read.parquet` scans — no caching, no driver
  * materialization — so Catalyst can push filters and prune columns into the
  * parquet reader regardless of data size.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` normalized to a microsecond TimestampType column.
    *
    * The stored type has drifted across testdata generations — originally
    * parquet TIMESTAMP(NANOS) (surfaced as nanosecond epoch longs under
    * `spark.sql.legacy.parquet.nanosAsLong=true`), currently timestamp[us]
    * (surfaced as TIMESTAMP_NTZ) — so this loader dispatches on the actual
    * physical type. Both branches agree with DuckDB's reading of the same
    * file under the UTC session timezone. EVERY events read (batch,
    * streaming via StreamingOps.eventsStream, CLI export) must route
    * through this dispatch: round 8 proved a raw read with a hard-coded ts
    * assumption breaks silently when the driver regenerates the data.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // already a timestamp type (future Spark versions)
        raw.withColumn("ts", date_trunc("microsecond", col("ts").cast("timestamp")))
    }
  }
}
