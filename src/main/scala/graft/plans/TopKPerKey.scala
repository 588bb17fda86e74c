package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy

import scala.collection.mutable

/** Custom whole-operator plan (SURVEY §7.2 path (c): LogicalPlan + Strategy
  * + SparkPlan): per-key top-k by a double-valued score WITHOUT sorting
  * whole partitions.
  *
  * Spark's native plan for "top k per group" is
  * `row_number().over(Window.partitionBy(...).orderBy(...))` + filter, which
  * sorts every partition — O(n log n) per partition and materializes the
  * sort. This operator keeps a bounded k-element min-heap per key —
  * O(n log k) with O(#keys · k) memory — the right physical shape when k is
  * tiny and groups are huge (the 100 TB "top 3 events per user" case).
  *
  * Registered via `spark.experimental.extraStrategies` (see [[TopKPerKey]])
  * or `GraftExtensions`.
  */
final case class TopKPerKeyPlan(keys: Seq[Expression], score: Expression, k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

final case class TopKPerKeyExec(keys: Seq[Expression], score: Expression, k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    // scoreProj reads the slot as a raw double — a non-double score would
    // silently reinterpret bytes into garbage rankings, so fail fast instead
    // (the TopKPerKey.apply API casts for you; this guards direct plan users)
    require(score.dataType == org.apache.spark.sql.types.DoubleType,
      s"TopKPerKey score must be DoubleType, got ${score.dataType.simpleString}; " +
        "wrap the score expression in Cast(_, DoubleType)")
    val keyExprs = keys
    val scoreExpr = score
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val scoreProj = UnsafeProjection.create(Seq(scoreExpr), childOutput)
      // per key: min-heap of (score, row) bounded at k
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[(Double, UnsafeRow)]]
      iter.foreach { row =>
        val key = keyProj(row)
        val s = scoreProj(row).getDouble(0)
        val heap = heaps.getOrElseUpdate(
          key.copy(),
          mutable.PriorityQueue.empty[(Double, UnsafeRow)](Ordering.by(-_._1)))
        if (heap.size < k) heap.enqueue((s, row.asInstanceOf[UnsafeRow].copy()))
        else if (s > heap.head._1) {
          heap.dequeue()
          heap.enqueue((s, row.asInstanceOf[UnsafeRow].copy()))
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** User-facing API: `TopKPerKey(df, Seq("user_id"), $"value", 3)`. */
object TopKPerKey {
  def apply(df: DataFrame, keyCols: Seq[String], scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val child = df.queryExecution.analyzed
    val keyExprs = keyCols.map(c => org.apache.spark.sql.GraftColumnBridge.expression(df(c)))
    val scoreExpr = {
      val e = org.apache.spark.sql.GraftColumnBridge.expression(df(scoreCol))
      if (e.dataType == org.apache.spark.sql.types.DoubleType) e
      else org.apache.spark.sql.catalyst.expressions.Cast(
        e, org.apache.spark.sql.types.DoubleType,
        Some(spark.sessionState.conf.sessionLocalTimeZone))
    }
    org.apache.spark.sql.GraftColumnBridge.ofRows(
      spark, TopKPerKeyPlan(keyExprs, scoreExpr, k, child))
  }

  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftTopKStrategy
}

object GraftTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, score, k, child) =>
      TopKPerKeyExec(keys, score, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
