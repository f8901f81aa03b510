package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  test("repeatedSpanStats: full copies are 100% duplicated, unique docs 0%, within-doc repetition alone does not count") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"),          // 10 toks → 7 4-gram spans
      (1L, "a b c d e f g h i j"),          // full copy of doc 0
      (2L, "z y x w v u t s"),              // unique — shares no 4-gram
      (3L, "p q r s p q r s p q r s"),      // self-repeating, single doc
      (4L, "a b c d k1 k2 k3")              // shares exactly "a b c d"
    ).toDF("doc_id", "text")

    val res = Dedup.repeatedSpanStats(docs, w = 4, minDocs = 2)
    val m = res
      .select("doc_id", "n_spans", "n_dup_spans")
      .as[(Long, Long, Long)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap

    assert(m(0L) == ((7L, 7L)), s"doc 0: ${m(0L)}") // every span shared with the copy
    assert(m(1L) == ((7L, 7L)))
    assert(m(2L) == ((5L, 0L)))                     // 8 toks → 5 spans, none shared
    // 12 toks → 9 spans, all grams repeat WITHIN doc 3 only → not duplicated
    assert(m(3L) == ((9L, 0L)))
    assert(m(4L) == ((4L, 1L)), s"doc 4: ${m(4L)}") // only 'a b c d' is shared

    val ratios = res.select("doc_id", "dup_ratio").as[(Long, Double)].collect().toMap
    assert(ratios(0L) == 1.0 && ratios(2L) == 0.0 && ratios(4L) == 0.25)
  }

  test("scrubRepeatedSpans rewrites docs: full copies empty out, partial overlap loses exactly the shared span, clean docs pass through") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, "a b c d e f g h i j"),          // full copy → fully scrubbed
      (2L, "z y x w v u t s"),              // clean → untouched
      (3L, "p q r s p q r s p q r s"),      // self-repeating only → untouched
      (4L, "a b c d k1 k2 k3")              // loses tokens covered by 'a b c d'
    ).toDF("doc_id", "text")
    val res = Dedup.scrubRepeatedSpans(docs, w = 4, minDocs = 2)
      .select("doc_id", "text", "n_tokens", "n_removed")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(res(0L) == (("", 10L, 10L)))
    assert(res(1L) == (("", 10L, 10L)))
    assert(res(2L) == (("z y x w v u t s", 8L, 0L)))
    assert(res(3L) == (("p q r s p q r s p q r s", 12L, 0L)))
    assert(res(4L) == (("k1 k2 k3", 7L, 4L)))
    // sub-window docs pass through with zero spans
    val short = Dedup.scrubRepeatedSpans(Seq((9L, "a b")).toDF("doc_id", "text"), w = 4)
      .select("text", "n_removed").as[(String, Long)].head()
    assert(short == (("a b", 0L)))
  }

  test("repeatedSpanStats: docs shorter than the window vanish; minDocs raises the duplication bar") {
    val docs = Seq(
      (0L, "a b c"),              // 3 toks < w=4 → no spans
      (1L, "x y z w"),            // one span, in 3 docs
      (2L, "x y z w"),
      (3L, "x y z w")
    ).toDF("doc_id", "text")
    val at2 = Dedup.repeatedSpanStats(docs, w = 4, minDocs = 2)
    assert(at2.filter(col("doc_id") === 0).isEmpty)
    assert(at2.filter(col("n_dup_spans") === 1).count() == 3)
    // minDocs = 4: the triple no longer clears the bar
    val at4 = Dedup.repeatedSpanStats(docs, w = 4, minDocs = 4)
    assert(at4.filter(col("n_dup_spans") > 0).isEmpty)
  }
}
