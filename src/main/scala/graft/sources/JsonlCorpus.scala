package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL corpus ingestion with corrupt-record quarantine — the entry point
  * of a web-crawl training pipeline: billions of newline-delimited JSON
  * records of which some fraction is always malformed (truncated uploads,
  * encoding damage, concatenated objects). The contract a pipeline needs is
  * (a) one bad line NEVER fails the job, (b) bad lines are PRESERVED raw —
  * quarantined for reprocessing and audit, not dropped silently, and
  * (c) the good path stays a single scan Catalyst can prune into.
  *
  * Implementation note: this reads the file as TEXT and parses with a
  * PERMISSIVE `from_json` rather than `spark.read.json`, deliberately.
  * The raw-file JSON reader refuses plans that reference only the corrupt
  * column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — Spark's documented
  * workaround is caching the parsed corpus, which is not an option at
  * 100 TB. The text+from_json formulation has no such restriction, the
  * quarantine side is an ordinary filter, and Catalyst's JSON expression
  * optimization prunes the parsed schema to the referenced fields.
  */
object JsonlCorpus {

  val CorruptCol = "_corrupt_record"

  /** Reads `path` as JSONL against an explicit DDL schema (never inferred:
    * inference is a full extra pass over 100 TB and is unstable under
    * drift). Blank lines are skipped (a JSONL blank line is not a record).
    * Output: the DDL's fields (null on malformed rows) plus [[CorruptCol]]
    * holding the raw line of any malformed record.
    */
  def read(spark: SparkSession, path: String, ddl: String): DataFrame = {
    val fields = StructType.fromDDL(ddl).fields.map(_.name)
    parseLines(
      spark.read.text(path).where(length(trim(col("value"))) > 0),
      col("value"), ddl)
      .select(fields.map(col).toSeq :+
        when(col("is_corrupt"), col("value")).as(CorruptCol): _*)
  }

  /** The split every ingest job wants: `(good, quarantine)`. Both sides are
    * filters over one parsed scan — no double read, no caching required.
    */
  def readWithQuarantine(spark: SparkSession, path: String, ddl: String)
      : (DataFrame, DataFrame) = {
    val all = read(spark, path, ddl)
    (all.where(col(CorruptCol).isNull).drop(CorruptCol),
      all.where(col(CorruptCol).isNotNull))
  }

  /** Parses a string column of JSON records with the PERMISSIVE + quarantine
    * contract (Kafka values, nested exports, or [[read]]'s text lines).
    * Fields are normalized to null on corrupt rows — partial parses are NOT
    * kept — so the output is a pure function of line validity and
    * cross-engine comparable. Adds the DDL's fields plus `is_corrupt`.
    */
  def parseLines(lines: DataFrame, lineCol: Column, ddl: String): DataFrame = {
    val schema = StructType(StructType.fromDDL(ddl).fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val parsed = from_json(lineCol, schema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol))
    // from_json returns a NULL struct (not a corrupt marker) for null or
    // whitespace-only input — treat that as corrupt too.
    val good = parsed.isNotNull && parsed.getField(CorruptCol).isNull
    val fields = StructType.fromDDL(ddl).fields.map { f =>
      when(good, parsed.getField(f.name)).as(f.name)
    }
    lines.select(
      (lines.columns.map(col).toSeq ++ fields :+
        (!good).as("is_corrupt")): _*)
  }
}
