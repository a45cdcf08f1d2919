package graft.util

/** Run INDEPENDENT Spark actions concurrently from driver threads
  * (optimization guide §2.6 "Overlap independent jobs"): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them
  * sequentially — so a later job's tasks back-fill executors freed by
  * an earlier job's straggler tail. Used by the media books, whose 3-4
  * per-modality signature materializations are independent decode
  * passes over disjoint corpora.
  *
  * Semantics: strict — every task runs, the call returns all results in
  * input order, and the FIRST failure (by input order) is rethrown
  * after all threads finish (no half-cancelled state; the tasks are
  * idempotent checkpoint/write actions). A fixed pool of `tasks.size`
  * threads is created per call and torn down before returning: these
  * are coarse once-per-gate fan-outs (3-4 tasks), not a hot path.
  */
object Par {
  def map[A](tasks: Seq[() => A]): Seq[A] = {
    if (tasks.size <= 1) return tasks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futures = tasks.map(t => pool.submit(
        new java.util.concurrent.Callable[A] { def call(): A = t() }))
      // get() in input order: the first input-order failure wins, and
      // every future is awaited (get on the rest in the finally chain
      // is unnecessary — shutdown + awaitTermination below drains them)
      futures.map(_.get())
    } catch {
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS)
    }
  }

  def run(tasks: Seq[() => Unit]): Unit = { map(tasks); () }
}
