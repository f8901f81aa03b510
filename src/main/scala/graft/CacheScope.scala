package graft

import org.apache.spark.sql.Dataset

/** Registry for operator-internal caches whose useful lifetime is one
  * query. Operators that cache an intermediate referenced several times
  * within a single plan (e.g. `Dedup.minhashLsh`'s signature table, the
  * v05 planted-pair input) register it here instead of leaking it for the
  * JVM lifetime; a long-lived session that runs many queries (Verify,
  * Bench, a notebook) calls [[clear]] once each query's result is
  * materialized.
  *
  * Caches with deliberate session lifetime — the per-fixture IVF index in
  * `PipelineQueries.indexFor`, the replay's epoch tables (which manage
  * their own unpersist discipline) — are NOT tracked, so [[clear]] never
  * touches them. A tracked dataset that was already unpersisted by its
  * owner is a no-op on clear.
  */
object CacheScope {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Register an operator-internal cached dataset; returns it unchanged. */
  def track[T <: Dataset[_]](ds: T): T = { tracked.add(ds); ds }

  /** Unpersist every tracked dataset and empty the registry. Non-blocking:
    * the blocks drop asynchronously, which is fine between queries. */
  def clear(): Unit = {
    var ds = tracked.poll()
    while (ds != null) { ds.unpersist(false); ds = tracked.poll() }
  }

  /** Run `body` and drop ONLY the caches it tracked, leaving pre-existing
    * entries (e.g. a long-lived corpus index) untouched — the per-trigger
    * discipline a long-running stream needs: `foreachBatch` bodies that
    * call caching operators would otherwise accumulate one tracked cache
    * per micro-batch forever ([[clear]] only runs between driver
    * queries). `body` must MATERIALIZE anything that outlives the scope
    * (collect/localCheckpoint) before returning, since its caches drop on
    * exit. Single-threaded scopes only: caches tracked concurrently by
    * another thread during `body` would be swept up with the scope's. */
  def scoped[T](body: => T): T = {
    val before = new java.util.IdentityHashMap[Dataset[_], Unit]()
    tracked.forEach(d => before.put(d, ()))
    val out = body
    val it = tracked.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (!before.containsKey(d)) { d.unpersist(false); it.remove() }
    }
    out
  }
}
