package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphPruneSpec extends SparkSpec {
  import spark.implicits._

  private def nodesOf(vs: (Long, Array[Float])*) =
    vs.toSeq.toDF("vec_id", "embedding")

  test("diversity toy: a covered cluster twin is pruned, the lateral direction is kept") {
    // p=(0,0); c1=(1,0) nearest; c2=(1.2,0) same direction (covered by
    // c1: 1.44·0.04 ≤ 1.44); c3=(0,1.3) lateral (not covered:
    // 1.44·2.69 > 1.69). RobustPrune at r=2, α=1.2 must keep {c1, c3} —
    // a plain top-2 cut would burn both edges on the cluster {c1, c2}.
    val nodes = nodesOf(
      0L -> Array(0f, 0f),
      1L -> Array(1f, 0f),
      2L -> Array(1.2f, 0f),
      3L -> Array(0f, 1.3f))
    val cands = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val kept = GraphPrune.alphaPrune(cands, nodes, r = 2, alpha = 1.2)
      .select("src", "dst", "rnk").as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(kept.toSeq == Seq((0L, 1L, 1), (0L, 3L, 2)), s"got ${kept.toSeq}")
  }

  test("contract: out-degree ≤ r, nearest candidate always kept rank-1, ranks contiguous") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val cands = KnnJoin.knnGraph(emb, k = 12)
    val pruned = GraphPrune.alphaPrune(cands, emb, r = 6, alpha = 1.2).cache()
    val per = pruned.groupBy("src").agg(
      count(lit(1)).as("n"),
      countDistinct("dst").as("nd"),
      min("rnk").as("r0"),
      max("rnk").as("r1"))
    assert(per.filter(col("n") > 6 || col("nd") =!= col("n") ||
      col("r0") =!= 1 || col("r1") =!= col("n")).isEmpty)
    // the nearest candidate survives pruning as rank 1, with its distance
    val nearest = cands.filter(col("rnk") === 1)
      .select(col("src"), col("dst"), col("dist2"))
    val kept1 = pruned.filter(col("rnk") === 1)
      .select(col("src"), col("dst"), col("dist2"))
    assert(nearest.exceptAll(kept1).isEmpty && kept1.exceptAll(nearest).isEmpty)
    pruned.unpersist(); emb.unpersist()
  }

  test("α → ∞ disables coverage: pruning degenerates to the plain top-r cut") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cands = KnnJoin.knnGraph(emb, k = 12)
    val pruned = GraphPrune.alphaPrune(cands, emb, r = 6, alpha = 1e9)
      .select("src", "dst", "rnk")
    val plain = cands.filter(col("rnk") <= 6).select("src", "dst", "rnk")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("beam search over the pruned graph holds the recall bar at equal degree budget") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val cands = KnnJoin.knnGraph(emb, k = 12)
    val pruned = GraphPrune.alphaPrune(cands, emb, r = 6, alpha = 1.2)
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val got = GraphSearch.search(q, pruned, emb, entries = Seq(0L), k = 5, beam = 16, rounds = 8)
    val exact = KnnJoin.exact(q, emb, k = 5)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mine = got.select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mean = exact.map { case (qid, want) =>
      (mine.getOrElse(qid, Set.empty) & want).size.toDouble / want.size
    }.sum / exact.size
    emb.unpersist()
    assert(mean >= 0.85, s"pruned-graph beam recall@5 $mean below bar")
  }
}
