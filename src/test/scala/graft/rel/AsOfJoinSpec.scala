package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes (key, t, px) / trades (key, t, qty) — the canonical as-of shape
  private def quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 20L, 2.5), ("A", 40L, 4.0),
    ("B", 15L, 9.0)).toDF("sym", "qt", "px")
  private def trades = Seq(
    ("A", 5L, 100L), ("A", 20L, 200L), ("A", 35L, 300L), ("A", 60L, 400L),
    ("B", 15L, 500L), ("C", 50L, 600L)).toDF("sym", "tt", "qty")

  private def run(forward: Boolean, tol: Option[org.apache.spark.sql.Column] = None) = {
    val f = if (forward) AsOfJoin.forward _ else AsOfJoin.backward _
    f(trades, "sym", "tt", quotes, "sym", "qt", Seq("px"), "px", tol)
      .select("sym", "tt", "qty", "px", "qt")
      .as[(String, Long, Long, Option[Double], Option[Long])]
      .collect().toSet
  }

  test("backward: greatest quote time <= trade time; equal-time inclusive; ties keep greatest tieBreak") {
    assert(run(forward = false) == Set(
      ("A", 5L, 100L, None, None),               // before any quote
      ("A", 20L, 200L, Some(2.5), Some(20L)),    // equal-time match, max-px tie win
      ("A", 35L, 300L, Some(2.5), Some(20L)),    // most recent behind
      ("A", 60L, 400L, Some(4.0), Some(40L)),
      ("B", 15L, 500L, Some(9.0), Some(15L)),
      ("C", 50L, 600L, None, None)))             // key absent on the right
  }

  test("forward: least quote time >= trade time; ties keep least tieBreak") {
    assert(run(forward = true) == Set(
      ("A", 5L, 100L, Some(1.0), Some(10L)),
      ("A", 20L, 200L, Some(2.0), Some(20L)),    // min-px tie win
      ("A", 35L, 300L, Some(4.0), Some(40L)),
      ("A", 60L, 400L, None, None),              // nothing at-or-after
      ("B", 15L, 500L, Some(9.0), Some(15L)),
      ("C", 50L, 600L, None, None)))
  }

  test("tolerance nulls matches farther than the bound") {
    val got = run(forward = false, tol = Some(lit(10L)))
    assert(got.contains(("A", 35L, 300L, None, None)))      // 35-20=15 > 10 dropped
    assert(got.contains(("A", 60L, 400L, None, None)))      // 60-40=20 > 10 dropped
    assert(got.contains(("A", 20L, 200L, Some(2.5), Some(20L)))) // lag 0 kept
  }

  test("matches pandas-style semantics on the fixture tables (events asof orders)") {
    // cross-check against an independent naive formulation on a small slice
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.t(spark, dir, "events").select("event_id", "user_id", "ts").limit(200).cache()
    val ord = graft.Tables.t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    val got = AsOfJoin.backward(ev, "user_id", "ts", ord, "o_custkey", "o_orderdate",
      Seq("o_orderkey"), "o_orderkey")
      .select("event_id", "o_orderkey").as[(Long, Option[Long])].collect().toMap
    val naive = ev.join(ord, ev("user_id") === ord("o_custkey") && ord("o_orderdate") <= ev("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey"))).as("o_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == naive)
    ev.unpersist()
  }

  test("plan: one shuffle on the key, no join node (window carries the payload)") {
    val plan = AsOfJoin.backward(trades, "sym", "tt", quotes, "sym", "qt", Seq("px"), "px")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected a window carry:\n$plan")
  }
}
