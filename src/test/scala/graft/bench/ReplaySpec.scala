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

  test("compactHusks drops merge husks; reference mode keeps them") {
    // every partition of the tiny fixture sits below MergeSize, so the
    // first maintain merges aggressively — reference mode must leave the
    // merged-away partitions behind as zero-row husks (quake_min.py:209-210),
    // the engine-added compactHusks flag must remove every one of them
    val off = Replay.run(spark, "/root/testdata/sf0.001", nQueries = 60, batchSize = 10, maintainEvery = 20)
    val on = Replay.run(
      spark, "/root/testdata/sf0.001", nQueries = 60, batchSize = 10, maintainEvery = 20, compactHusks = true)
    assert(off.maintainEvents == 3 && on.maintainEvents == 3)
    assert(off.huskPartitions > 0, s"expected husks in reference mode, got ${off.huskPartitions}")
    assert(off.toJson.contains("\"husk_partitions\""))
    assert(on.huskPartitions == 0, s"compactHusks left ${on.huskPartitions} husks")
    // compaction must not break the search: answers stay well above chance
    assert(on.meanRecall >= 0.5, s"mean recall with compaction ${on.meanRecall}")
    assert(on.finalPartitions > 0)
  }

  test("minOver takes per-metric timing mins and keeps protocol fields") {
    val a = Replay.Summary(10, 1.0, 5.0, 4.0, 9.0, 3.0, 100.0, 0.9, 7, 2, 30.0, 1, 3, 2)
    val b = a.copy(buildSec = 0.5, meanLatencyMs = 6.0, p50LatencyMs = 3.5, p95LatencyMs = 10.0, totalSec = 25.0)
    val m = Replay.minOver(Seq(a, b))
    assert(m.buildSec == 0.5 && m.meanLatencyMs == 5.0 && m.p50LatencyMs == 3.5)
    assert(m.p95LatencyMs == 9.0 && m.totalSec == 25.0)
    assert(m.nQueries == 10 && m.meanRecall == 0.9 && m.huskPartitions == 2 && m.churnEvents == 3)
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
