package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalMvSpec extends SparkSpec {
  import spark.implicits._

  // integer-valued doubles so sum equality is exact regardless of fold order
  private def events(ids: Range) = ids
    .map(i => (i.toLong, new java.sql.Timestamp(86400000L * (i % 3)), s"t${i % 2}", (i % 11).toDouble))
    .toDF("event_id", "ts", "event_type", "value")

  private def shape(df: org.apache.spark.sql.DataFrame) = df
    .select("day", "event_type", "n_events", "sum_v", "min_v", "max_v")
    .as[(String, String, Long, Double, Double, Double)].collect().toSet

  test("partial + merge ≡ full recompute, and the split point doesn't matter") {
    val ev = events(0 until 500)
    val full = shape(IncrementalMv.merge(IncrementalMv.partials(ev)))
    for (mod <- Seq(2, 4, 10)) {
      val base  = IncrementalMv.partials(ev.filter(col("event_id") % mod =!= 0))
      val delta = IncrementalMv.partials(ev.filter(col("event_id") % mod === 0))
      assert(shape(IncrementalMv.merge(base, delta)) == full, s"split mod=$mod diverged")
    }
  }

  test("three-way merge (base + two increments) matches one-shot") {
    val ev = events(0 until 300)
    val parts = Seq(0, 1, 2).map(r => IncrementalMv.partials(ev.filter(col("event_id") % 3 === r)))
    assert(shape(IncrementalMv.merge(parts: _*)) ==
      shape(IncrementalMv.merge(IncrementalMv.partials(ev))))
  }

  test("a delta-only group appears in the merged view") {
    val base  = IncrementalMv.partials(events(0 until 100).filter(col("event_type") === "t0"))
    val delta = IncrementalMv.partials(events(0 until 100).filter(col("event_type") === "t1"))
    val merged = shape(IncrementalMv.merge(base, delta))
    assert(merged.exists(_._2 == "t1") && merged.exists(_._2 == "t0"))
    assert(merged == shape(IncrementalMv.merge(IncrementalMv.partials(events(0 until 100)))))
  }
}
