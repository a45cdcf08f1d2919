package graft.engine

/** Write retry with backoff (K5) — reference `executeBatchWithRetry`
  * retries each batch up to 3 times with a 5 s delay
  * (`mysql.go:448-498`). Here the retried unit is a chunk write, which
  * is idempotent (mode=overwrite into a chunk-scoped directory), so a
  * retry after partial failure is safe.
  */
object Retry {
  def apply[T](attempts: Int = 3, delayMs: Long = 5000,
               sleep: Long => Unit = Thread.sleep,
               onError: (Int, Throwable) => Unit = (_, _) => ())(body: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      // NonFatal only: retrying after OutOfMemoryError/LinkageError runs
      // the body in a corrupt JVM, and InterruptedException must reach
      // the cooperative-cancel path, not sleep through retry delays.
      try return body
      catch { case scala.util.control.NonFatal(e) =>
        last = e; i += 1; onError(i, e)
        if (i < attempts) sleep(delayMs)
      }
    }
    throw last
  }
}
