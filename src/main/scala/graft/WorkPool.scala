package graft

/** Shared JVM-lifetime compute pool for driver-local kernels (the mirror
  * scan, local Lloyd's). These run on hot paths — the workload replay
  * issues one mirror scan per query at batchSize=1, so a fixed pool
  * created PER CALL costs tens of thousands of thread spawns per run,
  * pure overhead that lands directly in the per-query tail latency.
  * One shared pool amortizes that to zero. Daemon threads, so the pool
  * never blocks JVM exit; tasks from concurrent callers simply queue.
  *
  * INVARIANT — no nested submission: callers must submit all their chunks
  * from a NON-pool thread and only then block on the futures. A task that
  * itself submitted to this pool and blocked on the result could deadlock
  * once all `size` workers are doing the same (a fixed pool has no work
  * stealing and joins don't release the worker — that cure would be a
  * ForkJoinPool). [[assertNotPoolThread]] makes a violation fail loudly at
  * the submission site instead of hanging the replay. */
object WorkPool {
  val size: Int = math.max(1, Runtime.getRuntime.availableProcessors())

  private val poolThreadName = "graft-work"

  /** Call at the top of any kernel that is about to submit chunks and
    * block on them: throws immediately when invoked FROM a pool worker —
    * turning the latent saturation deadlock into a stack trace. */
  def assertNotPoolThread(caller: String): Unit = {
    if (Thread.currentThread().getName.startsWith(poolThreadName))
      throw new IllegalStateException(
        s"$caller called from a $poolThreadName thread: nested WorkPool submission " +
          "can deadlock a saturated fixed pool (see WorkPool scaladoc)")
  }

  lazy val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      size,
      (r: Runnable) => {
        val t = new Thread(r, poolThreadName)
        t.setDaemon(true)
        t
      })
}
