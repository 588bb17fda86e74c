package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Scale-out table sinks: the write-side half of the 100 TB posture.
  *
  * - `writePartitioned`: hive-style directory partitioning with an explicit
  *   `repartition` on the partition columns first, so each partition value is
  *   written by (at most) `filesPerPartition` tasks — avoiding the classic
  *   one-file-per-task-per-value small-file explosion.
  * - `writeBucketed`: persist a table bucketed (and sorted) by the join key;
  *   two tables bucketed the same way join with NO shuffle exchange
  *   (verified in BucketingSpec by inspecting the executed plan).
  */
object DataSinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      filesPerPartition: Int = 1): DataFrame = {
    df.repartition(
        math.max(1, filesPerPartition * 8),
        partitionCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** JSONL shard writer — the release-format counterpart of
    * `sources.JsonlCorpus`: one JSON object per line in the frame's column
    * order, shard count explicit (a release wants N stable shards, not
    * one file per upstream task). Null fields are omitted per JSON-lines
    * convention; `JsonlCorpus.read` round-trips them back to null, so
    * write→read is lossless for the schema'd fields (spec-pinned).
    */
  def writeJsonl(df: DataFrame, path: String, shards: Int = 1): Unit = {
    require(shards >= 1)
    df.select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(df.columns.map(col): _*)).as("value"))
      .repartition(shards)
      .write
      .mode(SaveMode.Overwrite)
      .text(path)
  }

  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCol: String, numBuckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
}
