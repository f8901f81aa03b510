package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Dedup.semDedup) — the d09 query certifies the pinned-
  * assignment run against DuckDB; this spec pins what the oracle can't:
  * the REAL k-means-clustered path agrees with the exact single-cluster
  * path on planted duplicates (the clustering prunes pairs without
  * changing the verdict when dups are genuinely colocated), and the
  * chain case exercises the transitive closure. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").cache()

  // the d09 planting: A = v ± 0.01 under +100000, B = v ± 0.02 under
  // +200000 — v–A and A–B always clear 0.99, v–B hovers at the boundary
  private def planted: DataFrame = {
    def copy(offset: Long, amp: Float) = emb.select(
      (col("vec_id") + offset).as("vec_id"),
      transform(
        col("embedding"),
        (x, i) => x + when(pmod(i, lit(2)) === 0, lit(amp)).otherwise(lit(-amp)))
        .as("embedding"))
    emb.unionByName(copy(100000L, 0.01f)).unionByName(copy(200000L, 0.02f))
  }

  private def verdicts(df: DataFrame): Set[(Long, Long, Long)] =
    df.as[(Long, Long, Long)].collect().toSet

  test("pinned assignment: originals kept, both planted copies fold to their source") {
    val all = planted.cache()
    try {
      val assign = all.select(col("vec_id"), pmod(col("vec_id"), lit(8L)).as("cluster_id"))
      val out = Dedup.semDedup(all, assign, minCosine = 0.99)
      val n = emb.count()
      val got = verdicts(out)
      val expected =
        (0L until n).map(v => (v, v, 1L)).toSet ++
          (0L until n).map(v => (v + 100000L, v, 0L)) ++
          (0L until n).map(v => (v + 200000L, v, 0L))
      assert(got == expected)
    } finally { all.unpersist(); graft.CacheScope.clear() }
  }

  test("k-means clustering refines the exact verdict: drops are a subset, recovery ≥ 97%") {
    val all = planted.cache()
    try {
      val (assigned, _) = graft.vector.KMeans.fit(all, "vec_id", "embedding", k = 4, iters = 8, seed = 42L)
      val kmAssign = assigned.select(col("vec_id"), col("cluster").cast("long").as("cluster_id"))
      val oneCluster = all.select(col("vec_id"), lit(0L).as("cluster_id"))
      val kmDrops = verdicts(Dedup.semDedup(all, kmAssign, minCosine = 0.99))
        .filter(_._3 == 0L).map(_._1)
      val exactDrops = verdicts(Dedup.semDedup(all, oneCluster, minCosine = 0.99))
        .filter(_._3 == 0L).map(_._1)
      // within-cluster pairs ⊆ all pairs, so clustered components refine
      // exact ones: anything the clustered run drops, the exact run drops
      assert(kmDrops.subsetOf(exactDrops), "clustered drops must be a subset of exact drops")
      // SemDeDup's approximation cost is boundary vectors whose copies
      // land in a neighboring cluster — measured 99.4% recovery here
      assert(
        kmDrops.size >= (exactDrops.size * 0.97).toInt,
        s"clustered path recovered only ${kmDrops.size}/${exactDrops.size} planted dups")
    } finally { all.unpersist(); graft.CacheScope.clear() }
  }

  test("chain closure: when v–B misses the bar, B still folds to v through A") {
    // synthetic 3-chain where the direct v–B edge is guaranteed absent:
    // unit basis vector e0, A rotated ~6°, B rotated ~12° (cos 8.1° bar
    // ≈ 0.99): cos(v,A) ≈ cos(A,B) ≈ 0.9945 ≥ 0.99, cos(v,B) ≈ 0.978 < 0.99
    def rot(theta: Double): Array[Float] =
      Array(math.cos(theta).toFloat, math.sin(theta).toFloat, 0f, 0f)
    val df = Seq(
      (0L, rot(0.0)), (1L, rot(0.105)), (2L, rot(0.21)),
      (10L, Array(0f, 0f, 1f, 0f)) // unrelated singleton
    ).toDF("vec_id", "embedding")
    val assign = df.select(col("vec_id"), lit(0L).as("cluster_id"))
    val got = verdicts(Dedup.semDedup(df, assign, minCosine = 0.99))
    assert(got == Set((0L, 0L, 1L), (1L, 0L, 0L), (2L, 0L, 0L), (10L, 10L, 1L)))
    graft.CacheScope.clear()
  }
}
