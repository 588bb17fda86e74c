package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathological key skew (the manual fallback when
  * AQE's skew-join splitting isn't enough — e.g. a single key holding >10%
  * of a 100 TB fact table).
  *
  * The skewed (large) side gets a random-free deterministic salt derived
  * from a high-cardinality column; the build side is replicated `salt`
  * times; the join runs on (key, salt) so the hot key spreads over `salt`
  * reducers. Result is row-identical to the plain join (spec-verified).
  */
object SkewJoin {

  /** @param saltFrom high-cardinality column on `large` that derives the
    *                 deterministic salt (avoids rand(), keeping the operator
    *                 replayable/retry-safe)
    */
  def salted(large: DataFrame, small: DataFrame, key: String,
      salt: Int = 16, saltFrom: String): DataFrame = {
    val spark = large.sparkSession
    import spark.implicits._
    val saltedLarge = large.withColumn("_salt", pmod(xxhash64(col(saltFrom)), lit(salt)))
    val replicatedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("_salt", $"_salt".cast("long"))
    saltedLarge
      .join(replicatedSmall, Seq(key, "_salt"))
      .drop("_salt")
  }
}
