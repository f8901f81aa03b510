package graft.bench

import graft.SparkSpec

/** Regression net for the workload-replay harness (O16/O17/O18): a short
  * run at the smallest fixture must produce a sane summary at both batch
  * sizes — the bench is otherwise the only consumer, and a broken harness
  * would silently zero the round's headline numbers. */
class ReplaySpec extends SparkSpec {

  test("short replay produces a sane summary (batched)") {
    val s = Replay.run(spark, "/root/testdata/sf0.001", nQueries = 40, batchSize = 10)
    assert(s.nQueries == 40)
    assert(s.batchSize == 10)
    // reference cadence (run_demo.py:71-81): churn at t=20,40 → 2 events;
    // maintain at t=50 never fires in 40 queries
    assert(s.churnEvents == 2, s"churn events ${s.churnEvents}")
    assert(s.maintainEvents == 0)
    assert(s.buildSec > 0.0 && s.totalSec > 0.0 && s.meanLatencyMs > 0.0)
    assert(s.finalPartitions > 0)
    assert(s.meanNprobe >= 1.0 && s.meanScanned >= 1.0)
    // queries are drawn from partition members; APS at target 0.9 over a
    // tiny corpus must stay well above chance
    assert(s.meanRecall >= 0.5, s"mean recall ${s.meanRecall}")
    assert(s.toJson.contains("\"p50_batch_mean_ms\""))
  }

  test("batchSize=1 replay emits true per-query percentile keys") {
    val s = Replay.run(spark, "/root/testdata/sf0.001", nQueries = 25, batchSize = 1, checkpointEvery = 20)
    assert(s.nQueries == 25 && s.batchSize == 1)
    // batchSize=1 must keep the same cadence: churn fires once (t=20)
    assert(s.churnEvents == 1, s"churn events ${s.churnEvents}")
    val json = s.toJson
    assert(json.contains("\"p50_ms\"") && json.contains("\"p95_ms\""))
    assert(!json.contains("batch_mean"))
    assert(s.p95LatencyMs >= s.p50LatencyMs)
  }
}
