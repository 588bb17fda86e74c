package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared engine capability: a Spark-side builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query that
  * must hash-match it exactly on the same parquet tables.
  *
  * Oracle-parity design rules (every query in the inventory follows these):
  *   - Aggregation of doubles goes through exact DECIMAL arithmetic and is
  *     cast back to double only at the end, so parallel/partial aggregation
  *     order cannot change the result.
  *   - Averages are `CAST(exact_decimal_sum AS DOUBLE) / COUNT`, one IEEE
  *     division, identical in both engines.
  *   - Every result carries a deterministic total ORDER BY (unique tiebreak).
  *   - Integer-typed outputs are cast to BIGINT on both sides (DuckDB
  *     promotes int sums to HUGEINT; Spark's year()/length() return ints).
  *   - Timestamps are emitted as formatted strings, never raw timestamps.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    /** SF-independent pass/fail verification (sound/bound/invariant gates
      * whose output is booleans/sentinels, often double-computing exact +
      * approximate by design). Their wall time measures the verification
      * harness, not an operator, so the bench times them in one pass only.
      */
    gate: Boolean = false)

/** Column helpers shared by the query inventory. */
object Exact {

  /** Exact fixed-point view of a double column (values in the testdata are
    * money/quantity-like: < 10^10 with 2 meaningful decimals).
    */
  def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** Narrow fixed-point for 0..9.99-range factors (discount/tax): keeps
    * decimal multiply results inside Spark's Long-backed fast path
    * (precision <= 18) instead of BigDecimal.
    */
  def decF(c: Column): Column = c.cast("decimal(4,2)")

  /** Order-insensitive exact sum of a double column, returned as double. */
  def sumDec(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average: exact decimal sum, one double division. */
  def avgDec(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** SQL fragments mirroring the above for the DuckDB oracle. */
  def sqlDec(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def sqlDecF(e: String): String = s"CAST($e AS DECIMAL(4,2))"
  def sqlSumDec(e: String): String = s"CAST(SUM(${sqlDec(e)}) AS DOUBLE)"
  def sqlAvgDec(e: String): String = s"CAST(SUM(${sqlDec(e)}) AS DOUBLE) / COUNT(*)"
}
