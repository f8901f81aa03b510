package graft

import org.apache.spark.sql.functions._

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  test("clear unpersists tracked caches and leaves untracked ones alone") {
    val tracked = CacheScope.track(spark.range(100).toDF().cache())
    val untracked = spark.range(50).toDF().cache()
    tracked.count(); untracked.count()
    assert(tracked.storageLevel.useMemory && untracked.storageLevel.useMemory)
    CacheScope.clear()
    assert(!tracked.storageLevel.useMemory, "tracked cache must drop on clear")
    assert(untracked.storageLevel.useMemory, "untracked (session-scoped) cache must survive")
    untracked.unpersist()
  }

  test("scoped drops only the caches the block tracked, keeping pre-existing ones") {
    val outer = CacheScope.track(spark.range(80).toDF().cache())
    outer.count()
    val inner = CacheScope.scoped {
      val d = CacheScope.track(spark.range(40).toDF().cache())
      d.count()
      assert(d.storageLevel.useMemory)
      d
    }
    assert(!inner.storageLevel.useMemory, "scope-tracked cache must drop on exit")
    assert(outer.storageLevel.useMemory, "pre-existing tracked cache must survive the scope")
    CacheScope.clear()
    assert(!outer.storageLevel.useMemory)
  }

  test("census: minhashLsh + v05-style union caches vanish after a harness clear") {
    // the round-3 leak: minhashLsh's signature table (and v05's unioned
    // input) stayed cached for the JVM lifetime; after a query + clear the
    // block-manager census must be back to its pre-query state
    val docs = (1L to 20L).map(i => (i, (1 to 40).map(j => s"w${(i * 7 + j) % 53}").mkString(" ")))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = graft.text.Dedup.minhashLsh(docs, shingleN = 3, numHashes = 16, bands = 4, minEstJaccard = 0.1)
    res.collect()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty,
      "operator should have registered an internal cache")
    CacheScope.clear()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty,
      "operator-internal caches must be gone after CacheScope.clear()")
  }
}
