package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: fixed-size point-frequency estimation over unbounded
  * key cardinality — the complement of [[HeavyHitters]] (Misra–Gries finds
  * WHICH keys are frequent; count-min answers "how often is key k" for ANY
  * k from `depth × width` cells, with one-sided error). The standard
  * streaming/telemetry sketch for token, n-gram, and domain frequencies
  * when the exact groupBy's key space would not fit anywhere.
  *
  * Representation: the sketch IS a DataFrame[row, bucket, c] — cells are
  * counts, so partial sketches from any partitioning/merge order sum to
  * the same table (the build below is exactly that map-side-combined sum).
  * At 100 TB nothing but `depth` copies of the key HASH rides the shuffle,
  * the result is `≤ depth·width` rows (driver/broadcast-sized by
  * construction), and estimation joins the broadcast sketch — the corpus
  * never shuffles.
  *
  * Guarantees (deterministic for fixed data + the fixed xxhash64 rows,
  * gate-checked in t68): estimates never undercount, and overcount is
  * bounded by the collision mass a width-`width` row can spread.
  */
object CountMin {

  /** Build the sketch table for a key column: `depth × width` cells.
    * One Generate + one partially-aggregated groupBy; the output is
    * `≤ depth·width` rows regardless of input size.
    */
  def sketch(df: DataFrame, keyCol: Column, depth: Int = 4,
      width: Int = 2048): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    df.select(keyCol.as("k"))
      .select(col("k"), explode(array((0 until depth).map(lit): _*)).as("row"))
      .select(col("row"), pmod(xxhash64(col("k"), col("row")), lit(width)).as("bucket"))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).cast("bigint").as("c"))
  }

  /** Point estimates for every distinct key in `keys`: the min over the
    * sketch rows of the hashed cell — `DataFrame[k, est]`. The sketch side
    * is broadcast (bounded by `depth·width`); a key hashing to an empty
    * cell estimates 0.
    */
  def estimate(sk: DataFrame, keys: DataFrame, keyCol: Column,
      depth: Int = 4, width: Int = 2048): DataFrame =
    keys.select(keyCol.as("k")).distinct()
      .select(col("k"), explode(array((0 until depth).map(lit): _*)).as("row"))
      .withColumn("bucket", pmod(xxhash64(col("k"), col("row")), lit(width)))
      .join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
}
