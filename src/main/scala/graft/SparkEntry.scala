package graft

import graft.core.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full capability inventory is assembled from the per-module registries;
  * each entry is a (Spark builder, optional DuckDB oracle) pair. Queries with
  * an oracle are hash-checked by the driver at sf0.01; oracle-less entries
  * (sketches, LSH, approximate ops) get a rows-only check and are instead
  * covered by ScalaTest specs against exact recomputations.
  */
object SparkEntry {

  def registry: Seq[GraftQuery] =
    relational.RelationalQueries.queries ++ relational.RelationalQueries2.queries ++
      relational.RelationalQueries3.queries ++ relational.ExtensionQueries.queries ++
      relational.ExtensionQueries2.queries ++ relational.ExtensionQueries3.queries ++
      relational.ExtensionQueries4.queries ++ relational.ExtensionQueries5.queries ++
      relational.ExtensionQueries6.queries ++ relational.ExtensionQueries7.queries ++
      relational.ExtensionQueries8.queries ++ relational.ExtensionQueries9.queries ++
      relational.ExtensionQueries10.queries ++ relational.ExtensionQueries11.queries ++
      relational.ExtensionQueries12.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.build(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
