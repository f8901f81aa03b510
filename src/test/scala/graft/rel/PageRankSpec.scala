package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val unit = 1000000000000L
  private val base = 3L * (unit / 20L)

  test("two-node cycle: symmetry is preserved exactly and ranks follow the damping recurrence") {
    val nodes = Seq(1L, 2L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.run(nodes, edges, iters = 5, unit = unit)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L), "cycle symmetry broken")
    // closed form of the integer recurrence: r' = base + (85 * r) div 100
    var r = unit
    (1 to 5).foreach(_ => r = base + (85L * r) / 100L)
    assert(got(1L) == r, s"rank ${got(1L)} disagrees with the exact recurrence $r")
  }

  test("isolated node holds exactly the damping base; total mass never exceeds the start mass") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst") // 3 is isolated
    val ranks = PageRank.run(nodes, edges, iters = 4, unit = unit)
    val m = ranks.as[(Long, Long)].collect().toMap
    assert(m(3L) == base, s"isolated node rank ${m(3L)} != base $base")
    assert(m.values.sum <= 3L * unit, "integer floors must only ever lose mass")
  }

  test("in-degree skew concentrates rank: a sink every node feeds outranks its feeders") {
    val nodes = (1L to 6L).toDF("node")
    val edges = (1L to 5L).map(i => (i, 6L)).toDF("src", "dst")
    val m = PageRank.run(nodes, edges, iters = 3, unit = unit).as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(i => m(6L) > m(i)), s"sink did not accumulate rank: $m")
  }

  test("lineage-truncation cadence is semantics-free: checkpointEvery 1, 4, iters+1 agree bit-for-bit") {
    // the one iterative-join operator: localCheckpoint placement must
    // never change a rank (it only truncates the plan), so every cadence
    // — per-step, the default, and never — replays identical Longs
    val nodes = (0L to 9L).toDF("node")
    val edges = (0L to 9L)
      .flatMap(n => Seq(1L, 2L, 3L).map(i => (n, (n * 7 + i * 13) % 10)))
      .toDF("src", "dst")
    val iters = 5
    val runs = Seq(1, 4, iters + 1).map { ce =>
      ce -> PageRank.run(nodes, edges, iters, unit, checkpointEvery = ce)
        .as[(Long, Long)].collect().toMap
    }
    val (_, ref) = runs.head
    runs.tail.foreach { case (ce, m) =>
      assert(m == ref, s"checkpointEvery=$ce diverged from checkpointEvery=1: $m vs $ref")
    }
  }

  test("entry-time overflow guard rejects |V|*unit combinations that could overflow 85*incoming") {
    val nodes = (1L to 200L).toDF("node")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    // 85 * 200 * 10^15 > Long.MaxValue (~9.22e18) — must throw at entry,
    // not corrupt ranks mid-superstep
    val e = intercept[IllegalArgumentException] {
      PageRank.run(nodes, edges, iters = 1, unit = 1000000000000000L)
    }
    assert(e.getMessage.contains("overflows"), e.getMessage)
  }

  test("personalized: teleport lands only on seeds; unreachable nodes are exactly 0") {
    // seed 1 → 2 → 3 (chain), node 4 isolated: mass can only flow
    // downhill from the seed, so 4 must be EXACTLY 0 (the "not in this
    // community" certificate) while the whole chain is positive
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val m = PageRank.personalized(nodes, edges, seeds, iters = 6, unit = unit)
      .as[(Long, Long)].collect().toMap
    assert(m(4L) == 0L, s"unreachable node got mass: ${m(4L)}")
    assert(m(1L) > 0 && m(2L) > 0 && m(3L) > 0, s"chain not reached: $m")
    // proximity ordering: the seed outranks its 1-hop, which outranks 2-hop
    assert(m(1L) > m(2L) && m(2L) > m(3L), s"proximity ordering broken: $m")
    // floors + dangling leak only — never exceed the seeded start mass
    assert(m.values.sum <= unit, "mass exceeded |S|*unit")
  }

  test("personalized: seed recurrence is exact, and cadence is semantics-free") {
    // a seed with a self-loop keeps all its mass: r' = base + (85·r) div 100
    val nodes = Seq(1L, 2L).toDF("node")
    val edges = Seq((1L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val m = PageRank.personalized(nodes, edges, seeds, iters = 5, unit = unit)
      .as[(Long, Long)].collect().toMap
    var r = unit
    (1 to 5).foreach(_ => r = base + (85L * r) / 100L)
    assert(m(1L) == r, s"seed rank ${m(1L)} disagrees with the exact recurrence $r")
    assert(m(2L) == 0L)
    // checkpoint cadence parity on a real-ish graph
    val ns = (0L to 9L).toDF("node")
    val es = (0L to 9L)
      .flatMap(n => Seq(1L, 2L, 3L).map(i => (n, (n * 7 + i * 13) % 10)))
      .toDF("src", "dst")
    val sd = Seq(0L, 5L).toDF("node")
    val runs = Seq(1, 4, 7).map { ce =>
      PageRank.personalized(ns, es, sd, iters = 6, unit = unit, checkpointEvery = ce)
        .as[(Long, Long)].collect().toMap
    }
    assert(runs.tail.forall(_ == runs.head), "cadence changed a personalized rank")
  }
}
