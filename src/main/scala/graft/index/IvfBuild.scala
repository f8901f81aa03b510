package graft.index

import graft.vector.{KMeans, VectorMean, VectorOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-level IVF index build (reference `AdaptiveIVF.build`,
  * quake_min.py:66-90 ∥ adaptive_ivf.mjs:156-192).
  *
  * Level-1 k-means (`k_coarse`, 12 iters, seed 42) over the whole corpus,
  * then level-2 k-means inside every coarse cell with
  * `kb = min(k_base, max(1, n_c / 50))` (10 iters, seed 123 — the reference
  * seeds 123+c per cell; our grouped k-means derives per-cell streams by
  * hashing the cell id into the seed, same independence, different bits).
  *
  * Spark shape: both levels are [[graft.vector.KMeans.fitGrouped]] passes —
  * level 2 runs ALL cells in one distributed job per iteration rather than
  * a per-cell loop, so build cost is O(iters) scans however many cells
  * exist. Per-partition centroids are then recomputed as the exact mean of
  * final members (the reference does the same, quake_min.py:85), partial
  * aggregation via [[graft.vector.VectorMean]].
  *
  * Empty level-2 clusters are skipped, matching quake_min.py:82 — pids are
  * dense over non-empty partitions only.
  */
object IvfBuild {
  val KCoarseDefault = 16
  val KBaseDefault = 4

  /** @param emb DataFrame with `vec_id: long`, `embedding: array<float>`. */
  def build(
      emb: DataFrame,
      dim: Int,
      kCoarse: Int = KCoarseDefault,
      kBase: Int = KBaseDefault): IvfModel = {
    val spark = emb.sparkSession

    val base = emb
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .filter(VectorOps.hasDim(col("embedding"), dim))
      .withColumn("__g", lit(0L))
      .cache()

    // Level 1: coarse cells.
    val (l1, coarseCents) =
      KMeans.fitGrouped(base, "__g", "vec_id", "embedding", Map(0L -> kCoarse), iters = 12, seed = 42L)
    val assigned1 = l1
      .withColumn("coarse_id", col("cluster").cast("long"))
      .select("vec_id", "embedding", "coarse_id")
      .cache()
    assigned1.count()
    base.unpersist()

    // Level 2: per-cell partitions, one grouped pass.
    val cellSizes = assigned1.groupBy("coarse_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val kFor = cellSizes.map { case (c, n) =>
      c -> math.min(kBase, math.max(1, (n / 50).toInt))
    }
    val (l2, _) =
      KMeans.fitGrouped(assigned1, "coarse_id", "vec_id", "embedding", kFor, iters = 10, seed = 123L)

    // Dense global pids in (coarse_id, cluster) order; empty clusters get
    // filtered out after the size scan below.
    val l2c = l2.withColumn("__pk", col("coarse_id") * 1000000L + col("cluster")).cache()
    val stats = l2c
      .groupBy("__pk", "coarse_id")
      .agg(VectorMean.fn(col("embedding")).as("centroid"), count(lit(1)).as("n"))
      .collect()
      .sortBy(_.getLong(0))
    val pidOf: Map[Long, Long] = stats.map(_.getLong(0)).zipWithIndex.map { case (pk, i) => pk -> i.toLong }.toMap

    // Map-literal lookup instead of a UDF: stays in codegen, no boxing.
    val vectors = l2c
      .withColumn("partition_id", try_element_at(typedLit(pidOf), col("__pk")))
      .select("vec_id", "embedding", "partition_id")
      .cache()
    vectors.count()
    assigned1.unpersist()
    l2c.unpersist()

    val partitions = stats.map { r =>
      PartitionMeta(
        pid = pidOf(r.getLong(0)),
        coarseId = r.getLong(1),
        centroid = r.getSeq[Float](2).toArray,
        size = r.getLong(3),
        hits = 0L,
        lastSplitAt = 0L)
    }.sortBy(_.pid).toVector

    val baseIds: Map[Long, Vector[Long]] = partitions.groupBy(_.coarseId).map { case (c, ps) =>
      c -> ps.map(_.pid).sorted
    }

    IvfModel(dim, vectors, coarseCents(0L), baseIds, partitions, queryCounter = 0L)
  }
}
