package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}

/** Scale-adaptive parallelism widening (optimization guide §2.2/§2.5: derive
  * partitioning from the input, never from a constant tuned for one
  * deployment).
  *
  * The driver's test parquet files are single-row-group (KBs-MBs), so a scan
  * plans as ONE task and every expression-heavy narrow stage downstream
  * (shingling, MinHash/SimHash signatures, tokenization) runs single-threaded
  * while the other cores idle - measured: 3.7 s of t78's 5.1 s wall was one
  * task computing shingles under its checkpoint, and the heaviest broadcast
  * subtrees in t32/t42 were 1-task signature builds. At 100 TB the same scan
  * arrives in thousands of splits and widening must cost nothing.
  *
  * [[spread]] therefore round-robin-repartitions ONLY when the planned scan
  * parallelism is materially below the session default; at scale (input
  * partitions >= default parallelism) it is the identity and no exchange
  * enters the plan. Apply it only where BOTH hold:
  *   - the result is partitioning-invariant: per-row hashes and projections,
  *     integer counts, set algebra - NOT floating-point accumulation whose
  *     fold order an oracle hash pins;
  *   - the per-row work downstream of the scan actually dominates the cost of
  *     round-robin-shuffling the payload once (round-20 driver record: six
  *     call sites where a cheap codegen'd hash/sketch followed the scan ran
  *     2-3x SLOWER widened - the shuffle + 32-task scheduling overhead never
  *     amortized; those sites now read the scan as planned).
  */
object Fanout {

  /** True iff the plan is scan + project/filter only. spread is restricted to
    * this shape (round-20 ADVICE): under AQE, `Dataset.rdd` on a plan WITH
    * exchanges finalizes the adaptive plan and eagerly EXECUTES every
    * upstream shuffle stage - the "planning-only" partition peek would
    * silently double-execute the caller's input. Any other shape passes
    * through untouched (identity is always safe; the caller's plan already
    * has exchanges, i.e. parallelism, of its own).
    */
  private def scanNarrow(plan: LogicalPlan): Boolean = plan match {
    case p: Project => scanNarrow(p.child)
    case f: Filter => scanNarrow(f.child)
    case s: SubqueryAlias => scanNarrow(s.child)
    case leaf if leaf.children.isEmpty => true
    case _ => false
  }

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (!scanNarrow(df.queryExecution.optimizedPlan)) return df
    // planning-only peek (no job - the plan is a narrow scan, see above):
    // how many tasks would the current plan run
    val current = df.rdd.getNumPartitions
    // widen only when the shortfall is material (>= 2x): a round-robin
    // repartition pays a full shuffle of the payload plus the
    // sort-before-repartition local sort; a sub-2x parallelism gain cannot
    // recoup that (round-20 ADVICE)
    if (current * 2 > target) df else df.repartition(target)
  }
}
