package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val Mult  = 2654435761L
  private val Prime = 2038074743L
  private def sign(i: Int, j: Int, m: Int): Double =
    1.0 - 2.0 * ((((i.toLong * m + j + 1) * Mult) % Prime) % 2)

  // deterministic pseudo-random corpus: coordinate = hash-derived in [-1, 1]
  private def vec(id: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(d => ((((id * dim + d) * Mult) % Prime).toDouble / Prime * 2 - 1).toFloat)

  test("projection matches the closed-form sign matrix, coordinate by coordinate") {
    val dim = 8; val m = 4
    val df = Seq((1L, vec(1L, dim).toSeq)).toDF("vec_id", "embedding")
    val proj = RandomProjection.project(df, dim, m, "embedding")
      .select("proj").as[Seq[Double]].head()
    val x = vec(1L, dim)
    val expected = Array.tabulate(m) { j =>
      (0 until dim).foldLeft(0.0)((acc, i) => acc + x(i).toDouble * sign(i, j, m))
    }
    assert(proj.length == m)
    proj.zip(expected).foreach { case (got, want) => assert(got == want, s"$got != $want") }
  }

  test("signs are balanced-ish (the hash actually mixes: not all one sign, no row constancy)") {
    val m = 16; val dIn = 64
    val all = for (i <- 0 until dIn; j <- 0 until m) yield sign(i, j, m)
    val plus = all.count(_ > 0)
    assert(plus > all.size / 4 && plus < all.size * 3 / 4, s"degenerate sign balance: $plus/${all.size}")
    // no input dim projects with a constant sign across output dims
    assert((0 until dIn).forall(i => (0 until m).map(j => sign(i, j, m)).distinct.size == 2))
  }

  test("member query returns itself at rank 1 with exact dist 0; recall vs exact clears 0.8") {
    val dim = 32; val n = 400
    val corpus = (0L until n.toLong).map(i => (i, vec(i, dim).toSeq)).toDF("vec_id", "embedding")
    val queries = (0L until 10L).map(i => (i, vec(i, dim).toSeq)).toDF("query_id", "qvec")
    val res = RandomProjection.topK(corpus, queries, dim, m = 8, k = 10, cand = 40)
      .select("query_id", "rank", "vec_id", "dist2")
      .as[(Long, Int, Long, Double)].collect()
    val top1 = res.filter(_._2 == 1)
    assert(top1.length == 10 && top1.forall(r => r._3 == r._1 && r._4 == 0.0))

    val exact = graft.index.KnnJoin.exact(queries, corpus, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = res.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recall = (0L until 10L).map(q => (got(q) & exact(q)).size.toDouble / 10).sum / 10
    assert(recall >= 0.8, s"JL recall@10 = $recall below bar")
  }

  test("full-probe ivfTopK + exact re-rank ≡ the plain topK scan (projection is corpus-global)") {
    val dim = 16; val m = 4; val n = 120L
    val corpus = (0L until n).map(i => (i, vec(i, dim).toSeq)).toDF("vec_id", "embedding")
    val parted = corpus.withColumn("partition_id", pmod(col("vec_id"), lit(4L)))
    val queries = (0L until 4L).map(i => (i, vec(i * 13 + 7, dim).toSeq)).toDF("query_id", "qvec")
    val proj = RandomProjection.project(parted, dim, m, "embedding")
      .select("vec_id", "partition_id", "proj")
    // every query probes every partition → pruning filters nothing
    val probes = queries.select("query_id")
      .crossJoin(spark.range(4).select(col("id").as("partition_id")))
    val full = graft.vector.Pq.rerankExact(
      RandomProjection.ivfTopK(proj, probes, queries, dim, m, cand = 20),
      corpus, queries, k = 5)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    val plain = RandomProjection.topK(corpus, queries, dim, m, k = 5, cand = 20)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(full == plain, "full-probe pruned scan diverged from the plain scan")
    graft.CacheScope.clear()
  }
}
