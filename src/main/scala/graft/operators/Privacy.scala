package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators for dataset release: identifier pseudonymization and
  * k-anonymity auditing/suppression — the steps between "cleaned corpus"
  * and "shippable corpus" once PII-bearing identifiers are involved.
  * [[TextPipeline.redactPii]] handles PII inside free text; these handle
  * PII-shaped COLUMNS (user ids, session keys, upload paths).
  *
  * All narrow, codegen'd projections plus one groupBy for the audit —
  * nothing here shuffles more than the quasi-identifier aggregation, and
  * the pseudonym is a pure function of (salt, value) so joins across
  * tables pseudonymized with the same salt still line up.
  */
object Privacy {

  /** Salted SHA-256 pseudonym: deterministic (same salt + value → same
    * pseudonym, so referential integrity survives), non-reversible without
    * the salt, engine-independent (lower-hex SHA-256 everywhere). Rotate
    * the salt per release to break cross-release linkability.
    */
  def pseudonymize(v: Column, salt: String): Column =
    sha2(concat(lit(salt), v.cast("string")), 256)

  /** Per-group sizes over the quasi-identifier columns plus the k flag:
    * a group smaller than `k` re-identifies its members by combination —
    * the audit every tabular release runs. One partial-aggregated groupBy.
    */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[Column], k: Long): DataFrame = {
    require(quasi.nonEmpty && k >= 1)
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("meets_k", col("n") >= k)
  }

  /** Suppression: drops every row whose quasi-identifier combination occurs
    * fewer than `k` times — the standard remediation when generalization
    * isn't on the table.
    *
    * The failing set is usually dimension-sized, but with high-cardinality
    * quasi columns nearly EVERY combination can fail `k`, making it
    * corpus-sized — so the plan carries no static `broadcast()` hint (a
    * forced broadcast there is a driver/executor OOM). AQE's runtime size
    * check promotes the anti join to broadcast-hash exactly when the
    * failing side turns out small, and keeps the shuffled join otherwise;
    * `<=>` keys stay hash-joinable either way.
    */
  def suppressRare(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    val failing = kAnonymityAudit(df, quasi.map(col), k).where(!col("meets_k"))
      .select(quasi.map(q => col(q).as(s"__q_$q")): _*)
    // null-safe equality: a null quasi value is itself a distinguishing
    // combination and must suppress like any other rare group
    val cond = quasi.map(q => col(q) <=> col(s"__q_$q")).reduce(_ && _)
    df.join(failing, cond, "left_anti")
  }
}
