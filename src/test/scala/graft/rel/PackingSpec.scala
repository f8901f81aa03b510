package graft.rel

import graft.{CacheScope, SparkSpec}
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences equals the sequential concat-then-chunk definition") {
    // pseudo-random token counts, input deliberately shuffled and spread
    // over many partitions — the two-level prefix sum must still produce
    // the exact sequential answer
    val rnd = new scala.util.Random(7)
    val docs = (0L until 500L).map(i => (i, 1L + rnd.nextInt(300)))
    val df = rnd.shuffle(docs).toDF("doc_id", "n").repartition(13)
    val got = Packing
      .packSequences(df, "doc_id", "n", budget = 256L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)]
      .collect()
      .toSeq
    var acc = 0L
    val want = docs.map { case (id, n) =>
      val s = acc; acc += n
      (id, n, s, s / 256L, (s + n - 1) / 256L)
    }
    assert(got == want)
    CacheScope.clear()
  }

  test("packSequences: boundary-straddling docs span sequences; zero-token docs drop") {
    val df = Seq((1L, 10L), (2L, 0L), (3L, 10L), (4L, 5L)).toDF("doc_id", "n")
    val got = Packing
      .packSequences(df, "doc_id", "n", budget = 16L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)]
      .collect()
      .toSeq
    assert(got == Seq(
      (1L, 10L, 0L, 0L, 0L),
      (3L, 10L, 10L, 0L, 1L), // tokens 10..19 straddle the 16-token boundary
      (4L, 5L, 20L, 1L, 1L)))
    CacheScope.clear()
  }

  test("packSequences values are invariant to the shuffle partition count") {
    val docs = (0L until 200L).map(i => (i, (i % 37) + 1)).toDF("doc_id", "n")
    def run() = Packing.packSequences(docs, "doc_id", "n", 64L).orderBy("doc_id").collect().toSeq
    val base = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "11")
      assert(run() == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    CacheScope.clear()
  }

  test("packSequences plans no global window (the single-task scale-killer)") {
    val docs = (0L until 50L).map(i => (i, 3L)).toDF("doc_id", "n")
    val plan = Packing
      .packSequences(docs, "doc_id", "n", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window node in:\n$plan")
    CacheScope.clear()
  }
}
