package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"

  // corpus: 50 long distinct docs; delta: near-copies of docs 1 and 2
  // (first token dropped), one exact intra-delta twin pair of doc 1's
  // copy, and one novel doc sharing nothing.
  private def corpus = (1L to 50L).map(i => (i, s"doc$i $base word$i more$i")).toDF("doc_id", "text")
  private def delta = Seq(
    (1001L, s"$base word1 more1"),
    (1002L, s"$base word1 more1"), // intra-delta twin of 1001 — must NOT pair
    (1003L, s"$base word2 more2"),
    (1004L, "totally unrelated novel content nothing shared here at all")
  ).toDF("doc_id", "text")

  test("planted corpus near-copies are flagged; novel and intra-delta pairs are not") {
    val out = Dedup.minhashLshAgainst(corpus, delta,
      shingleN = 3, numHashes = 32, bands = 16, minEstJaccard = 0.5)
    val pairs = out.select("delta_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1001L, 1L)), s"1001 must match corpus doc 1: $pairs")
    assert(pairs.contains((1002L, 1L)), s"1002 must match corpus doc 1: $pairs")
    assert(pairs.contains((1003L, 2L)), s"1003 must match corpus doc 2: $pairs")
    assert(!pairs.exists(_._1 == 1004L), s"novel doc must not match: $pairs")
    assert(pairs.forall(p => p._1 > 1000L && p._2 <= 50L),
      s"only cross delta-corpus pairs allowed: $pairs")
  }

  test("estimates are in [minEst, 1] and the exact self-copy estimates 1.0") {
    val deltaExact = Seq((2001L, s"doc7 $base word7 more7")).toDF("doc_id", "text")
    val out = Dedup.minhashLshAgainst(corpus, deltaExact,
      shingleN = 3, numHashes = 32, bands = 16, minEstJaccard = 0.5)
      .select("corpus_id", "est_jaccard").as[(Long, Double)].collect()
    assert(out.exists { case (id, est) => id == 7L && est == 1.0 },
      s"identical content must estimate 1.0: ${out.toSeq}")
  }

  test("plan shape: the band join broadcasts the delta — the corpus side never re-shuffles") {
    val out = Dedup.minhashLshAgainst(corpus, delta,
      shingleN = 3, numHashes = 32, bands = 16, minEstJaccard = 0.5)
    out.collect()
    val s = out.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"band join must broadcast the delta:\n$s")
  }
}
