package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  // (key, id, start, end)
  private def iv(rows: (String, Long, Long, Long)*) =
    rows.toDF("k", "id", "s", "e")

  test("overlapping and touching intervals merge; strictly-after starts a new island") {
    val df = iv(
      ("a", 1L, 0L, 10L), // island 0
      ("a", 2L, 5L, 15L), // overlaps -> merges
      ("a", 3L, 15L, 20L), // touches (start == running end) -> merges
      ("a", 4L, 21L, 30L), // strictly after -> new island
      ("b", 5L, 0L, 1L)) // other key unaffected
    val got = Intervals
      .unionPerKey(df, "k", "s", "e", "id")
      .orderBy("k", "island")
      .as[(String, Long, Long, Long, Long)]
      .collect()
      .toSeq
    assert(got == Seq(("a", 0L, 0L, 20L, 3L), ("a", 1L, 21L, 30L, 1L), ("b", 0L, 0L, 1L, 1L)))
  }

  test("containment: an interval swallowed by earlier coverage cannot split the island (running-max rule, not lag)") {
    // [0,100) then [10,20) (contained) then [30,40) (contained): a naive
    // lag(e) rule would see 30 > 20 and wrongly break the island
    val df = iv(("a", 1L, 0L, 100L), ("a", 2L, 10L, 20L), ("a", 3L, 30L, 40L), ("a", 4L, 150L, 160L))
    val got = Intervals
      .unionPerKey(df, "k", "s", "e", "id")
      .orderBy("island")
      .as[(String, Long, Long, Long, Long)]
      .collect()
      .toSeq
    assert(got == Seq(("a", 0L, 0L, 100L, 3L), ("a", 1L, 150L, 160L, 1L)))
  }

  test("coverage sums island lengths exactly and takes the longest island") {
    val df = iv(("a", 1L, 0L, 10L), ("a", 2L, 5L, 12L), ("a", 3L, 20L, 50L))
    val got = Intervals
      .coverage(df, "k", "s", "e", "id")
      .as[(String, Long, Long, Long)]
      .head()
    assert(got == (("a", 2L, 42L, 30L))) // 12 + 30 covered, longest 30
  }

  test("reserved working/output columns on the input are rejected at entry, not silently shadowed") {
    // a pre-existing __pme would be overwritten by the running-max temp
    // (silent corruption risk); a pre-existing island would collide with
    // the output schema — both must throw before any computation
    Seq("__pme", "island").foreach { bad =>
      val df = iv(("a", 1L, 0L, 10L)).withColumn(bad, lit(99L))
      val e = intercept[IllegalArgumentException] {
        Intervals.unionPerKey(df, "k", "s", "e", "id")
      }
      assert(e.getMessage.contains(bad), e.getMessage)
    }
  }

  test("start ties break deterministically by id and still merge into one island when overlapping") {
    val df = iv(("a", 2L, 0L, 5L), ("a", 1L, 0L, 8L), ("a", 3L, 7L, 9L))
    val got = Intervals
      .unionPerKey(df, "k", "s", "e", "id")
      .as[(String, Long, Long, Long, Long)]
      .collect()
      .toSeq
    assert(got == Seq(("a", 0L, 0L, 9L, 3L)))
  }
}
