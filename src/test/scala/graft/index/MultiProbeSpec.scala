package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiProbeSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random unit-ish vectors (same family as the fixture)
  private def vec(id: Long, dim: Int): Seq[Float] =
    (0 until dim).map(d => ((((id * dim + d) * 2654435761L) % 2038074743L).toDouble / 2038074743L * 2 - 1).toFloat)

  private val dim = 32
  private lazy val corpus = (0L until 300L).map(i => (i, vec(i, dim))).toDF("vec_id", "embedding")
  private lazy val queries = (0L until 8L).map(i => (i, vec(i * 37 + 5, dim))).toDF("query_id", "qvec")

  test("single-probe results are a subset of multi-probe results at equal k-candidates") {
    // compare the CANDIDATE-driven outcome: with k large enough to keep all
    // candidates, every single-probe hit must also be a multi-probe hit
    val k = 300
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val single = hits(KnnJoin.lsh(queries, corpus, dim, k, nPlanes = 16, bands = 4))
    val multi = hits(KnnJoin.lshMultiProbe(queries, corpus, dim, k, nPlanes = 16, bands = 4))
    assert(single.subsetOf(multi),
      s"multi-probe lost ${(single -- multi).size} single-probe candidates")
    assert(multi.size > single.size, "multi-probe probed nothing beyond the identity buckets")
    graft.CacheScope.clear()
  }

  test("multi-probe recall@10 dominates single-probe on the same sketch") {
    val exact = graft.CacheScope.track(KnnJoin.exact(queries, corpus, 10).cache())
    def recall(df: org.apache.spark.sql.DataFrame) =
      IvfSearch.recallAtK(df, exact, 10, queries).agg(avg("recall")).as[Double].head()
    val rs = recall(KnnJoin.lsh(queries, corpus, dim, 10, nPlanes = 32, bands = 8))
    val rm = recall(KnnJoin.lshMultiProbe(queries, corpus, dim, 10, nPlanes = 32, bands = 8))
    assert(rm >= rs, s"multi-probe recall $rm below single-probe $rs")
    assert(rm >= 0.8, s"multi-probe recall $rm below the 0.8 bar")
    graft.CacheScope.clear()
  }

  test("output contract matches the lsh backend: k rows per query, descending cosine, id ties") {
    val out = KnnJoin.lshMultiProbe(queries, corpus, dim, k = 5, nPlanes = 16, bands = 4)
      .select("query_id", "rank", "vec_id", "cos")
      .as[(Long, Int, Long, Double)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.forall { case (_, rs) => rs.map(_._2).sorted.toSeq == (1 to rs.length) })
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
        case _           => ()
      }
    }
    graft.CacheScope.clear()
  }
}
