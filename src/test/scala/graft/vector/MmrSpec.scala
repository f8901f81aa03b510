package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def cands(rows: Seq[(Long, Long, Double, Seq[Float])]) =
    rows.toDF("query_id", "vec_id", "rel", "embedding")

  test("mmr: lambda=1 reproduces the relevance ranking; diversity penalty demotes the near-duplicate") {
    // candidates for one query: 1 and 2 are near-identical (cos ≈ 1),
    // 3 is orthogonal-ish with lower relevance
    val a = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val a2 = Seq(0.999f, 0.045f, 0.0f, 0.0f) // ~same direction as a
    val b = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val c = cands(Seq(
      (0L, 1L, 0.95, a),
      (0L, 2L, 0.94, a2),
      (0L, 3L, 0.80, b)))

    val pure = Mmr.rerank(c, k = 3, lambda = 1.0)
      .orderBy("sel_rank").select("vec_id").as[Long].collect().toSeq
    assert(pure == Seq(1L, 2L, 3L), s"lambda=1 must be the rel order, got $pure")

    // at lambda=0.5 the second pick must skip the near-duplicate of pick 1:
    // score(2) = .5*.94 - .5*cos(a,a2) ≈ .47 - .499 < score(3) = .5*.80 - .5*0 = .40
    val div = Mmr.rerank(c, k = 3, lambda = 0.5)
      .orderBy("sel_rank").select("vec_id").as[Long].collect().toSeq
    assert(div == Seq(1L, 3L, 2L), s"diversity order wrong: $div")
  }

  test("mmr: parallel across queries, k bounded by candidate count, first pick maximizes rel") {
    val e1 = Seq(1.0f, 0.0f)
    val e2 = Seq(0.0f, 1.0f)
    val c = cands(Seq(
      (0L, 10L, 0.9, e1), (0L, 11L, 0.5, e2),
      (1L, 20L, 0.3, e2))) // query 1 has only ONE candidate
    val res = Mmr.rerank(c, k = 2, lambda = 0.7)
    val byQ = res.select("query_id", "sel_rank", "vec_id").as[(Long, Int, Long)]
      .collect().groupBy(_._1)
    assert(byQ(0L).toSeq.sortBy(_._2).map(_._3).toSeq == Seq(10L, 11L))
    // fewer candidates than k → fewer rows, never fabricated picks
    assert(byQ(1L).map(_._3).toSeq == Seq(20L))
  }

  test("mmr: a zero-norm candidate cannot hijack the selection via NaN similarity") {
    // vec 99 is all-zero → cosine(·, 99) is NaN; unguarded, NaN sorts as
    // the largest mmr and wins round 1, then poisons every later round.
    // rel of the zero vector is also NaN (as a cosine to the query would
    // be) → it must be dropped entirely, and the real vectors must rank
    // purely on their own merits.
    val cands = Seq(
      (0L, 1L, 0.9, Array(1f, 0f)),
      (0L, 2L, 0.8, Array(0f, 1f)),
      (0L, 99L, Double.NaN, Array(0f, 0f)))
      .toDF("query_id", "vec_id", "rel", "embedding")
    val out = Mmr.rerank(cands, k = 3, lambda = 0.5)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 2L), s"got $out")
    assert(!out.map(_._1).contains(3), "the NaN row must not produce a third pick")
    graft.CacheScope.clear()
  }
}
