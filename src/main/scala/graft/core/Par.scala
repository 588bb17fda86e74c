package graft.core

/** Overlap two INDEPENDENT Spark actions (optimization guide §2.6: actions
  * are only sequential because driver code calls them sequentially; a second
  * in-flight job back-fills executors the first one's tail leaves idle).
  *
  * Use ONLY for actions with no data dependency and no ordering contract —
  * the verification gates' paired materializations (brute-force twin vs
  * index query) are the motivating case: each side is a deterministic
  * localCheckpoint whose VALUE is unaffected by when it runs, so the pair
  * is bit-identical to the sequential code, minus one action's worth of
  * driver-coordination latency.
  */
object Par {
  def both[A, B](fa: => A, fb: => B): (A, B) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try Await.result(Future(fa).zip(Future(fb)), Duration.Inf)
    finally pool.shutdown()
  }
}
