package graft.queries

/**
 * Overlap INDEPENDENT Spark actions (optimization-guide §2.6): Spark's
 * scheduler happily runs several jobs at once inside one application —
 * actions are only sequential because driver code calls them
 * sequentially. A store verb that writes several derived tables from the
 * same staged input was paying each write's scheduling latency and task
 * tail back to back; submitting them from a small pool lets one job's
 * tasks back-fill the executor slots another job's tail has freed. At
 * cluster scale the same shape holds (the writes are independent outputs
 * of one materialized input — no ordering constraint exists until the
 * commit point that follows all of them).
 *
 * Failure contract: every thunk is awaited; the FIRST failure rethrows
 * (unwrapped) after all thunks have settled, so a caller's catch sees
 * the same exception class it would have seen sequentially and no thunk
 * is left running when the verb returns.
 */
private[queries] object Jobs {

  private[queries] def par(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = t()
        })
      }
      var firstFailure: Throwable = null
      var interrupted: InterruptedException = null
      futs.foreach { f =>
        try {
          // An interrupt of the CALLER must not leave worker thunks
          // running against the verb's staging dir: cancel everything
          // still pending and re-assert the interrupt after the drain
          // (the finally's shutdownNow + await bounds the in-flight one).
          if (interrupted != null) f.cancel(true)
          else f.get()
        }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure == null) firstFailure = e.getCause
          case e: InterruptedException =>
            interrupted = e
            f.cancel(true)
        }
      }
      if (interrupted != null) throw interrupted
      if (firstFailure != null) throw firstFailure
    } finally {
      pool.shutdownNow()
      // Bounded drain: give cancelled thunks a moment to unwind so no
      // write job outlives the verb; don't block forever on one that
      // ignores interruption (nonce-isolated staging + commit-marker-last
      // keeps a straggler harmless). A caller interrupt during the drain
      // re-asserts the thread's interrupt status instead of escaping the
      // finally (which would mask the try block's exception).
      try pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
      catch { case _: InterruptedException => Thread.currentThread().interrupt() }
    }
  }
}
