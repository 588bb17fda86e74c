package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic first-instance-wins deduplication (SURVEY.md §2.5 O1).
  *
  * Reference semantics: `deduplicate_and_format_school_records` keeps the
  * first occurrence of each key in file order
  * (`src/program3_generate_website.py:138-154`). Spark's `dropDuplicates`
  * picks an arbitrary winner, so the order column captured at scan time
  * (`monotonically_increasing_id`) threads through a ranking window.
  *
  * Scale: one shuffle on the key; the window computes rank per key group —
  * identical cost shape to any keyed dedup at 100 TB. Skewed keys are handled
  * by AQE; for pathological single-key skew use `dedupExact` (hash agg) when
  * the winner doesn't matter.
  */
object FirstWinsDedup {

  def apply(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("_fw_rn", row_number().over(w))
      .filter(col("_fw_rn") === 1)
      .drop("_fw_rn")
  }

  def apply(df: DataFrame, keys: Seq[Column], order: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order)
    df.withColumn("_fw_rn", row_number().over(w))
      .filter(col("_fw_rn") === 1)
      .drop("_fw_rn")
  }

  /** Deterministic last-instance-wins: Program 1 writes `{code}.md` per row
    * in file order, so a later duplicate row overwrites the earlier file and
    * the LAST occurrence's content survives
    * (`src/program1_generate_markdowns.py:382-388`). Under `local[32]` an
    * undeduplicated keyed sink would let an arbitrary task win; this is the
    * first-wins window with the order reversed, run BEFORE the sink.
    */
  def lastWins(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame =
    apply(df, keys.map(col), col(orderCol).desc)

  /** Winner-agnostic exact dedup: plain hash aggregation (map-side partial
    * dedup, no window) — the cheaper form when any representative row will do.
    */
  def dedupExact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)
}
