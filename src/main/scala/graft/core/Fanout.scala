package graft.core

import org.apache.spark.sql.DataFrame

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
  * parallelism is below the session default; at scale (input partitions >=
  * default parallelism) it is the identity and no exchange enters the plan.
  * Apply it only where the result is partitioning-invariant: per-row hashes
  * and projections, integer counts, set algebra - NOT floating-point
  * accumulation whose fold order an oracle hash pins.
  */
object Fanout {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // planning-only peek (no job): how many tasks would the current plan run
    val current = df.rdd.getNumPartitions
    if (current >= target) df else df.repartition(target)
  }
}
