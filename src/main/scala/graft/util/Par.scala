package graft.util

/** Bounded-concurrency driver-side fan-out for INDEPENDENT Spark
  * actions (spark_optimization_guide §2.6 "Overlap independent jobs"):
  * Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. Maintenance sweeps that rewrite one partition per
  * table (purge/compact/repair), and per-arrival histogram writes whose
  * only cross-arrival coupling is the LATER readout, are chains of
  * small independent jobs whose per-job fixed cost (planning +
  * scheduling + commit) dominates at increment scale; submitting them
  * from a small thread pool lets the next job's tasks back-fill
  * executors freed by the current job's tail instead of paying the
  * fixed costs end-to-end.
  *
  * Results return in TASK ORDER (not completion order), the first
  * failure is rethrown after all in-flight tasks finish (no torn
  * half-schedule), and `maxParallel` bounds in-flight jobs — 2-4 is
  * plenty: enough to hide the fixed costs, not so many that they fight
  * for executors. Tasks must be mutually independent (the caller's
  * contract — nothing here orders them). Spark job-scoped thread-local
  * properties (job description/group) ARE inherited: the pool is
  * created fresh per call and `newFixedThreadPool` constructs its
  * threads inside `submit` on the CALLER's thread, so SparkContext's
  * InheritableThreadLocal properties copy over — `cancelJobGroup` from
  * the caller's group still reaches every fanned-out job. What DOES
  * change vs a sequential loop is failure behavior: a failing task no
  * longer stops later siblings from running to completion (drain-all
  * before rethrow) — callers needing stop-at-first-failure state
  * semantics must not fan out.
  */
object Par {
  def run[T](tasks: Seq[() => T], maxParallel: Int = 4): Seq[T] = {
    require(maxParallel >= 1, "Par.run needs maxParallel >= 1")
    if (tasks.isEmpty) Seq.empty
    else if (tasks.size == 1 || maxParallel == 1) tasks.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxParallel, tasks.size))
      try {
        val futures = tasks.map(t =>
          pool.submit(new java.util.concurrent.Callable[T] {
            override def call(): T = t()
          }))
        // drain EVERY future before surfacing the first failure (no
        // torn half-schedule: in-flight swaps run to completion rather
        // than being interrupted mid-write); ExecutionException unwraps
        // to the task's own failure so callers see the same exception
        // type as the sequential loop did
        val outcomes = futures.map(f => scala.util.Try(f.get()))
        outcomes.map(_.recover {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }.get)
      } finally {
        pool.shutdownNow()
        ()
      }
    }
  }
}
