package graft.rel

import graft.SparkSpec

class CappedMixtureSpec extends SparkSpec {
  import spark.implicits._

  private def run(avails: Seq[(String, Long)], budget: Double, temp: Double = 0.5) =
    Sampling.cappedMixture(avails.toDF("source", "avail"), budget, temp)
      .select("source", "avail", "t_target", "capped")
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap

  test("allocations are feasible, exhaust the budget, and cap exactly the starved sources") {
    // one tiny source (cap binds), two large ones sharing the rest
    val out = run(Seq(("a", 100L), ("b", 40000L), ("c", 90000L)), budget = 50000.0)
    val (_, _, ta, cappedA) = out("a")
    assert(cappedA && ta == 100.0, s"tiny source must be fully taken: $ta")
    out.values.foreach { case (_, avail, t, _) => assert(t <= avail + 1e-6) }
    val total = out.values.map(_._3).sum
    assert(math.abs(total - 50000.0) < 1e-3, s"allocations must exhaust the budget: $total")
    // uncapped sources split the remainder in sqrt proportion
    val (_, _, tb, cb) = out("b"); val (_, _, tc, cc) = out("c")
    assert(!cb && !cc)
    assert(math.abs(tb / tc - math.sqrt(40000.0 / 90000.0)) < 1e-4)
  }

  test("budget ≥ total availability caps every source at its cap") {
    val out = run(Seq(("a", 10L), ("b", 20L)), budget = 1000.0)
    assert(out("a")._3 == 10.0 && out("b")._3 == 20.0)
    assert(out.values.forall(_._4))
  }

  test("no cap binding reduces to plain temperature shares") {
    val out = run(Seq(("a", 10000L), ("b", 40000L)), budget = 300.0)
    assert(out.values.forall(!_._4))
    // shares ∝ sqrt(avail): 100 vs 200 → 1:2 split of 300
    assert(math.abs(out("a")._3 - 100.0) < 1e-6 && math.abs(out("b")._3 - 200.0) < 1e-6)
  }

  test("cascading caps: rising water level caps sources in breakpoint order") {
    // w = (3, 4, 1000), breakpoints r = (3, 4, 1000); budget 5025 forces
    // λ = (5025 − 9 − 16)/1000 = 5 ∈ [r_b, r_c) → both small sources cap
    val out = run(Seq(("a", 9L), ("b", 16L), ("c", 1000000L)), budget = 5025.0)
    assert(out("a")._4 && out("a")._3 == 9.0)
    assert(out("b")._4 && out("b")._3 == 16.0)
    assert(!out("c")._4 && math.abs(out("c")._3 - 5000.0) < 1e-6)
  }
}
