package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide exact PARAGRAPH dedup with document reassembly (the
  * RefinedWeb/MassiveText recipe): a boilerplate paragraph that appears in
  * ten million pages survives exactly once — in the first document that
  * contains it — and every document is rebuilt with its remaining
  * paragraphs in original order.
  *
  * Differs from [[TextPipeline]]'s boilerplate-line removal (frequency
  * threshold, per-line) and duplicated-span detection (windowed hashes,
  * report-only): this is FIRST-WINS global dedup at paragraph granularity
  * with reassembly — the output is a corpus, not a report.
  *
  * Scale shape: paragraphs shuffle once keyed by their md5 (the dedup
  * decision), surviving paragraphs shuffle once keyed by doc (the
  * reassembly) — both unavoidable for reassembly semantics; no window, no
  * driver state, and the keeper table carries only (hash, id, pos), never
  * text. First-wins keeper = min (id, pos) struct: deterministic under any
  * partitioning, and rerun-stable so incremental re-crawls keep the same
  * survivors.
  */
object ParagraphDedup {

  /** Paragraph rows: (id, pos, para), empty paragraphs dropped (they are
    * separator structure, not content).
    */
  def explodeParagraphs(df: DataFrame, idCol: Column, textCol: Column,
      sep: String = "\n\n"): DataFrame =
    df.select(idCol.as("id"),
        posexplode(split(textCol, Pattern.quote(sep))).as(Seq("pos", "para")))
      .where(length(col("para")) > 0)

  /** Dedup + reassemble. Output: (id, text_dedup, n_paras, n_kept) — a doc
    * whose every paragraph lost first-wins comes back with empty text and
    * n_kept = 0, preserving corpus membership for downstream joins.
    */
  def dedupParagraphs(df: DataFrame, idCol: Column, textCol: Column,
      sep: String = "\n\n"): DataFrame = {
    val paras = explodeParagraphs(df, idCol, textCol, sep)
      .withColumn("h", md5(col("para")))
    // one tiny row per DISTINCT paragraph: its first (id, pos) in the corpus
    val keepers = paras.groupBy(col("h"))
      .agg(min(struct(col("id"), col("pos"))).as("first"))
    val kept = paras.join(keepers, "h")
      .where(struct(col("id"), col("pos")) === col("first"))
    // lambda-free reassembly (see TextPipeline.dedupLines: the interpreted
    // transform/array_sort HOF pair measured 7x worse cold and was the
    // documented deopt-storm source; sort_array + struct-field extraction
    // is fully codegen'd)
    val rebuilt = kept.groupBy(col("id")).agg(
      count(lit(1)).as("n_kept"),
      concat_ws(sep,
        sort_array(collect_list(struct(col("pos"), col("para"))))
          .getField("para")).as("text_dedup"))
    df.select(idCol.as("id"),
        size(filter(split(textCol, Pattern.quote(sep)), p => length(p) > 0))
          .cast("long").as("n_paras"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("n_paras"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
