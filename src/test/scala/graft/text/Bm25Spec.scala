package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark filter join"),         // high tf for the query term
    (2L, "spark filter join scan merge"),          // tf 1, same length
    (3L, "filter join scan merge batch"),          // no query term
    (4L, ("spark " + "pad " * 40).trim)            // tf 1 but much longer doc
  ).toDF("doc_id", "text")

  test("term frequency dominates: the stuffed doc outranks a single mention") {
    val r = Bm25.score(corpus, Seq("spark")).orderBy(col("score").desc).collect()
    assert(r.head.getAs[Long]("doc_id") == 1L, s"tf=3 doc must rank first: ${r.mkString(", ")}")
  }

  test("documents with no query term score exactly zero") {
    val r = Bm25.score(corpus, Seq("spark")).filter(col("doc_id") === 3L).collect()
    assert(r.length == 1 && r.head.getAs[Double]("score") == 0.0)
  }

  test("length normalization: equal tf, longer document scores lower") {
    val m = Bm25.score(corpus, Seq("spark")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(m(2L) > m(4L), s"b=0.75 must penalize the padded doc: short=${m(2L)} long=${m(4L)}")
  }

  test("multi-term score is the sum of single-term scores (fixed-order fold)") {
    val both = Bm25.score(corpus, Seq("spark", "merge")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val a = Bm25.score(corpus, Seq("spark")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val b = Bm25.score(corpus, Seq("merge")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    corpus.select("doc_id").as[Long].collect().foreach { id =>
      assert(math.abs(both(id) - (a(id) + b(id))) < 1e-12,
        s"doc $id: ${both(id)} != ${a(id)} + ${b(id)}")
    }
  }

  test("plan shape: stats side broadcasts; no sort-merge join; one data shuffle") {
    val df = Bm25.score(corpus, Seq("spark", "merge"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      s"1-row stats side must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"), s"corpus must not shuffle for the stats attach:\n$s")
    // exchanges: per-doc aggregate + the 1-row global stats reduction only
    // (the stats branch reuses the per-doc exchange — reuse must not count)
    val n = countShuffles(df)
    assert(n <= 2, s"expected ≤2 executed shuffles (per-doc agg + 1-row stats), got $n:\n$s")
  }
}
