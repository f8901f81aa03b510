package graft.index

import graft.vector.{KMeans, VectorMean}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online mutation, micro-batch flavored (reference does row-at-a-time
  * method calls, quake_min.py:92-125; Spark semantics are preserved at
  * batch granularity — SURVEY.md §7.4).
  *
  * Inserts route through the two-level centroid hierarchy exactly like the
  * reference (coarse argmin → base argmin within the cell's routing list,
  * quake_min.py:93-104, including the empty-cell → new partition branch,
  * quake_min.py:96-102). Deletes are anti-joins — unknown ids are
  * naturally no-ops (quake_min.py:113). Touched partitions get their
  * centroid recomputed as the exact mean of remaining members, matching
  * `np.mean` recompute (quake_min.py:108, 122).
  */
object IvfMutate {

  /** Fold per-partition probe hits of a finished query batch into the
    * metadata (reference `bp.hits += 1` per probed partition,
    * quake_min.py:155; `query_counter` bump, quake_min.py:148). */
  def recordHits(model: IvfModel, probes: DataFrame, nQueries: Long): IvfModel = {
    val hitCounts = probes
      .groupBy("partition_id")
      .agg(count(lit(1)).as("h"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    model.copy(
      partitions = model.partitions.map(p => p.copy(hits = p.hits + hitCounts.getOrElse(p.pid, 0L))),
      queryCounter = model.queryCounter + nQueries)
  }

  /** Batch insert.
    * @param adds `(vec_id long, embedding array<float>)`, ids fresh. */
  def insert(model: IvfModel, adds: DataFrame): IvfModel = {
    val spark = adds.sparkSession
    val sc = spark.sparkContext

    // Empty coarse cells spawn one new partition per cell for this batch
    // (the reference spawns one per inserted row since it inserts
    // row-at-a-time, quake_min.py:96-102 — batch granularity here).
    val emptyCells = model.coarseCentroids.indices
      .map(_.toLong)
      .filter(c => model.coarseBaseIds.getOrElse(c, Vector.empty).isEmpty)
    val newPidFor: Map[Long, Long] =
      emptyCells.zipWithIndex.map { case (c, i) => c -> (model.partitions.length + i).toLong }.toMap

    val coarseB = sc.broadcast(model.coarseCentroids)
    val routesB = sc.broadcast(
      model.coarseBaseIds.map { case (c, pids) =>
        c -> pids.map(p => (p, model.partitions(p.toInt).centroid)).toArray
      })
    val newPidB = sc.broadcast(newPidFor)

    val routeUdf = udf { v: Seq[Float] =>
      val cIdx = KMeans.nearest(coarseB.value, v).toLong
      val routes = routesB.value.getOrElse(cIdx, Array.empty[(Long, Array[Float])])
      if (routes.isEmpty) newPidB.value(cIdx)
      else routes(KMeans.nearest(routes.map(_._2), v))._1
    }

    val routed = adds
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .withColumn("partition_id", routeUdf(col("embedding")))
      .cache()

    val newVectors = model.vectors.unionByName(routed).cache()
    val touched = routed.select("partition_id").distinct().collect().map(_.getLong(0)).toSet
    val updated = recomputeStats(newVectors, touched)
    routed.unpersist()

    // Existing partitions refreshed; brand-new partitions appended in pid order.
    val existing = model.partitions.map { p =>
      updated.get(p.pid).map { case (c, n) => p.copy(centroid = c, size = n) }.getOrElse(p)
    }
    val fresh = newPidFor.toVector.sortBy(_._2).flatMap { case (cell, pid) =>
      updated.get(pid).map { case (c, n) =>
        PartitionMeta(pid, cell, c, n, hits = 0L, lastSplitAt = 0L)
      }
    }
    val baseIds = fresh.foldLeft(model.coarseBaseIds) { case (m, p) =>
      m.updated(p.coarseId, m.getOrElse(p.coarseId, Vector.empty) :+ p.pid)
    }
    model.copy(vectors = newVectors, partitions = existing ++ fresh, coarseBaseIds = baseIds)
  }

  /** Batch delete by id; unknown ids no-op. Emptied partitions stay as
    * husks with their last centroid (reference quake_min.py:121-122 skips
    * the centroid recompute when a partition empties). */
  def delete(model: IvfModel, ids: DataFrame): IvfModel = {
    val del = ids.select(col("vec_id").cast("long").as("vec_id"))
    val touched = model.vectors
      .join(del, Seq("vec_id"), "left_semi")
      .select("partition_id").distinct()
      .collect().map(_.getLong(0)).toSet
    if (touched.isEmpty) return model

    val newVectors = model.vectors.join(del, Seq("vec_id"), "left_anti").cache()
    val updated = recomputeStats(newVectors, touched)
    val parts = model.partitions.map { p =>
      if (!touched.contains(p.pid)) p
      else
        updated.get(p.pid) match {
          case Some((c, n)) => p.copy(centroid = c, size = n)
          case None         => p.copy(size = 0L) // husk keeps stale centroid
        }
    }
    model.copy(vectors = newVectors, partitions = parts)
  }

  /** Exact (mean, count) recompute for the touched partitions only — one
    * partial-aggregated job over the filtered table. */
  private def recomputeStats(vectors: DataFrame, touched: Set[Long]): Map[Long, (Array[Float], Long)] = {
    if (touched.isEmpty) return Map.empty
    vectors
      .filter(col("partition_id").isInCollection(touched))
      .groupBy("partition_id")
      .agg(VectorMean.fn(col("embedding")).as("centroid"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1).toArray, r.getLong(2)))
      .toMap
  }
}
