package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Misra–Gries heavy hitters: the deterministic frequent-items sketch, as a
  * typed Spark `Aggregator` so it partial-aggregates map-side and merges
  * associatively across partitions (Agarwal et al., "Mergeable Summaries",
  * PODS'12: merging two MG summaries and pruning back to k counters keeps
  * the εn error bound, ε = 1/(k+1)).
  *
  * Guarantees after any merge order — which is why the registry gate can be
  * deterministic even though the surviving counter SET is not:
  *   - no false counts: est(x) <= true(x);
  *   - bounded undercount: true(x) - est(x) <= n/(k+1);
  *   - completeness: every x with true(x) > n/(k+1) keeps a counter.
  *
  * At 100 TB this finds the boilerplate tokens/domains/templates worth
  * special-casing with one pass and k counters per partition — no shuffle
  * of the full frequency table, unlike an exact groupBy count.
  */
object HeavyHitters {

  final class MisraGries(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
    require(k >= 1)

    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def reduce(b: mutable.HashMap[String, Long], x: String): mutable.HashMap[String, Long] = {
      if (b.contains(x)) b(x) += 1L
      else if (b.size < k) b(x) = 1L
      else {
        // decrement-all step; dropping zeroed counters keeps |b| <= k
        val dead = mutable.ArrayBuffer.empty[String]
        b.mapValuesInPlace((_, v) => v - 1L)
        b.foreach { case (key, v) => if (v <= 0L) dead += key }
        dead.foreach(b.remove)
      }
      b
    }

    def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long])
        : mutable.HashMap[String, Long] = {
      b.foreach { case (key, v) => a(key) = a.getOrElse(key, 0L) + v }
      if (a.size > k) {
        // subtract the (k+1)-th largest count from everyone; survivors <= k
        val d = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        val dead = mutable.ArrayBuffer.empty[String]
        a.mapValuesInPlace((_, v) => v - d)
        a.foreach { case (key, v) => if (v <= 0L) dead += key }
        dead.foreach(a.remove)
      }
      a
    }

    def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap

    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Frequent items of a string column: one row per surviving counter,
    * `(item, est)`. The result is a sketch — see the class doc for what the
    * estimates guarantee.
    */
  def frequentItems(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val ds = df.select(col(itemCol).cast("string")).na.drop()
      .map(_.getString(0))(Encoders.STRING)
    val one = ds.select(new MisraGries(k).toColumn.name("mg"))
    one.select(explode(col("mg")).as(Seq("item", "est")))
  }
}
