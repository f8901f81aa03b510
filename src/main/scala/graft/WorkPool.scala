package graft

/** Shared JVM-lifetime compute pool for driver-local kernels (the mirror
  * scan, local Lloyd's). These run on hot paths — the workload replay
  * issues one mirror scan per query at batchSize=1, so a fixed pool
  * created PER CALL costs tens of thousands of thread spawns per run,
  * pure overhead that lands directly in the per-query tail latency.
  * One shared pool amortizes that to zero. Daemon threads, so the pool
  * never blocks JVM exit; tasks from concurrent callers simply queue. */
object WorkPool {
  val size: Int = math.max(1, Runtime.getRuntime.availableProcessors())

  lazy val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      size,
      (r: Runnable) => {
        val t = new Thread(r, "graft-work")
        t.setDaemon(true)
        t
      })
}
