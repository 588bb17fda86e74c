package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary construction and corpus encoding — the tokenizer-plumbing
  * layer between a cleaned corpus and a training run: build the top-V
  * token vocabulary deterministically, then map every document to id
  * sequences with OOV routing.
  *
  * Scale shape: the candidate counts are a partial-aggregated groupBy over
  * token hashes of the corpus; top-V selection is `orderBy(...).limit(V)`,
  * which Spark plans as TakeOrdered (per-partition heaps + driver merge of
  * V rows — never a global sort of the vocabulary). Id assignment is a
  * window over the ALREADY-LIMITED V rows, so the single-partition window
  * is driver-bounded by construction. Encoding joins the exploded corpus
  * against the BROADCAST vocabulary and reassembles per doc — ids, not
  * tokens, ride the reassembly shuffle.
  */
object Vocab {

  /** Top-`size` whitespace tokens as `(token, id)` with ids `1..size`
    * assigned by descending frequency (token string as the deterministic
    * tiebreak). Id 0 is reserved for OOV by [[encode]].
    */
  def build(df: DataFrame, textCol: Column, size: Int): DataFrame = {
    require(size >= 1)
    val counts = df
      .select(explode(split(trim(textCol), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("__c"))
    val top = counts.orderBy(col("__c").desc, col("token").asc).limit(size)
    // V rows by construction: the one-partition window is driver-sized
    top.withColumn("id",
        row_number().over(Window.orderBy(col("__c").desc, col("token").asc))
          .cast("bigint"))
      .select(col("token"), col("id"))
  }

  /** Encodes each document as its token-id sequence against `vocab`
    * (broadcast); unknown tokens map to id 0. Output: `id` (= `idCol`),
    * `ids` (array<bigint> in token order), `n_tokens`, `n_oov`.
    */
  def encode(df: DataFrame, idCol: Column, textCol: Column,
      vocab: DataFrame): DataFrame = {
    val toks = df
      .select(idCol.as("id"), split(trim(textCol), "\\s+").as("__t"))
      .select(col("id"), posexplode(col("__t")).as(Seq("__pos", "token")))
    val mapped = toks
      .join(broadcast(vocab.select(col("token"), col("id").as("__vid"))),
        Seq("token"), "left_outer")
      .select(col("id"), col("__pos"),
        coalesce(col("__vid"), lit(0L)).as("__tid"))
    mapped.groupBy(col("id"))
      .agg(
        transform(array_sort(collect_list(struct(col("__pos"), col("__tid")))),
          s => s.getField("__tid")).as("ids"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("__tid") === 0L, 1L).otherwise(0L)).as("n_oov"))
  }
}
