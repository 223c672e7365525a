package graft.util

import java.util.concurrent.{Callable, ExecutionException, Executors}

/** Run INDEPENDENT Spark actions concurrently from a bounded pool —
  * the optimization-guide §2.6 lever ("actions are only sequential
  * because your driver code calls them sequentially"): a multi-component
  * store commit that lands 5–8 parquet layouts pays one fixed
  * job-submission + write-commit overhead per component when the driver
  * loops over them; submitting them together lets each job's straggler
  * tail back-fill with the next job's tasks, so the wall is ~max, not
  * sum, of the component walls. On a cluster the same overlap hides the
  * per-job scheduling barrier; nothing here is local-mode-specific.
  *
  * Contract: tasks must be data-independent and must write DISTINCT
  * paths (all call sites here are per-component writes of one version
  * dir, or driver-side collects of independent frames). Results return
  * in input order; the first failure rethrows its cause after every
  * task has settled, so no write is half-cancelled under another's
  * exception. Thread-safety of the shared machinery is established:
  * Spark supports multi-threaded job submission by design (guide
  * §2.6), and [[graft.sources.PrunedIndex]]'s caches are TrieMaps with
  * an atomic version-token counter. */
object Par {
  def run[T](tasks: Seq[() => T], parallelism: Int = 4): Seq[T] = {
    if (tasks.isEmpty) return Seq.empty
    if (tasks.size == 1) return Seq(tasks.head())
    // A SQL table-function builder (GraftTableFunctions) runs INSIDE
    // SessionCatalog.lookupFunction, which synchronizes on the catalog:
    // pool threads would then block on that monitor during their own
    // function lookups while this thread waits on them — a deadlock
    // (observed on graft_curation_ledger). When the calling thread
    // holds the catalog monitor, degrade to sequential — identical
    // results, no overlap, no deadlock.
    val holdsCatalogLock = org.apache.spark.sql.SparkSession.getActiveSession
      .exists(s => Thread.holdsLock(s.sessionState.catalog))
    if (holdsCatalogLock) return tasks.map(_())
    val pool = Executors.newFixedThreadPool(math.min(tasks.size, parallelism))
    try {
      val futures = tasks.map(t => pool.submit(new Callable[T] { def call(): T = t() }))
      // settle ALL before rethrowing — a fail-fast return would leave
      // sibling writes racing a caller's cleanup/retry
      val results = futures.map(f => scala.util.Try(f.get()))
      results.foreach {
        case scala.util.Failure(e: ExecutionException) => throw e.getCause
        case scala.util.Failure(e) => throw e
        case _ =>
      }
      results.map(_.get)
    } finally pool.shutdown()
  }

  /** [[run]] for effect-only tasks. */
  def runUnit(tasks: Seq[() => Unit], parallelism: Int = 4): Unit = {
    run[Unit](tasks, parallelism): Unit
  }
}
