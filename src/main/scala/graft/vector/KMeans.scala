package graft.vector

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame-native grouped Lloyd's k-means.
  *
  * Runs an independent k-means for every group (key = a long column) in ONE
  * DataFrame pass per iteration: broadcast the current per-group centroids,
  * assign each row to its nearest centroid with a tight primitive loop,
  * partially aggregate per-(group, cluster) vector means ([[VectorMean]]),
  * and collect only `#groups · k · d` floats to the driver. Job count is
  * O(iters), not O(groups · iters) — this is what lets the reference's
  * two-level IVF build (level-2 k-means per coarse cell, quake_min.py:66-90)
  * run as a constant number of distributed passes on a 1000-executor
  * cluster instead of a per-cell job storm.
  *
  * Determinism (needed for replayable plans and stable tests — the
  * reference uses seeded `rng.choice`, quake_min.py:25): initial centroids
  * are the k lowest `xxhash64(seed, group, id)` members of each group, and
  * empty clusters reseed from the same hash-ordered pool (reference
  * reseeds to a random point, quake_min.py:34-35 ∥ adaptive_ivf.mjs:113-117).
  * No `rand()` anywhere.
  */
object KMeans {

  /** Nearest-centroid assignment (first-minimum wins, like `np.argmin`). */
  private[graft] def nearest(cents: Array[Array[Float]], v: Seq[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var s = 0.0
      var i = 0
      val n = math.min(ct.length, v.length)
      while (i < n) { val d = v(i).toDouble - ct(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** Fit k-means per group.
    *
    * @param df        input; must contain `groupCol` (long), `idCol` (long),
    *                  `vecCol` (array&lt;float&gt;). Should be cached by the caller
    *                  (it is scanned `iters + 2` times).
    * @param kFor      clusters per group (groups absent from the map are dropped)
    * @return (input + `cluster` int column, final centroids per group)
    */
  def fitGrouped(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      vecCol: String,
      kFor: Map[Long, Int],
      iters: Int,
      seed: Long): (DataFrame, Map[Long, Array[Array[Float]]]) = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val maxK = math.max(1, kFor.values.max)

    // Groups absent from kFor are dropped, as documented — the assignment
    // closure below would otherwise NPE on them.
    val dfk =
      if (kFor.isEmpty) df.limit(0)
      else df.filter(col(groupCol).isInCollection(kFor.keySet))

    // Hash-ordered per-group pool: init points + reseed spares.
    val hc = xxhash64(lit(seed), col(groupCol), col(idCol))
    val w = Window.partitionBy(col(groupCol)).orderBy(hc, col(idCol))
    val pool: Map[Long, Array[Array[Float]]] = dfk
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxK * 3)
      .select(col(groupCol), col("__rn"), col(vecCol))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (g, rows: Array[Row]) =>
        g -> rows.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray)
      }

    var centroids: Map[Long, Array[Array[Float]]] = kFor.flatMap { case (g, k) =>
      pool.get(g).map(p => g -> p.take(math.max(1, math.min(k, p.length))))
    }

    def assignCol(cs: Map[Long, Array[Array[Float]]]) = {
      val bc = sc.broadcast(cs)
      udf { (g: Long, v: Seq[Float]) => nearest(bc.value(g), v) }
    }

    var it = 0
    while (it < iters) {
      val assign = assignCol(centroids)
      val stats = dfk
        .withColumn("__c", assign(col(groupCol), col(vecCol)))
        .groupBy(col(groupCol), col("__c"))
        .agg(VectorMean.fn(col(vecCol)).as("__mean"))
        .collect()
      val byG = stats.groupBy(_.getLong(0))
      centroids = centroids.map { case (g, cents) =>
        val means = byG
          .getOrElse(g, Array.empty[Row])
          .map(r => r.getInt(1) -> r.getSeq[Float](2).toArray)
          .toMap
        val spares = pool.getOrElse(g, Array.empty)
        val next = Array.tabulate(cents.length) { ci =>
          means.getOrElse(
            ci,
            // empty cluster → reseed to a deterministic pool point
            if (spares.nonEmpty) spares((it * cents.length + ci) % spares.length)
            else cents(ci))
        }
        g -> next
      }
      it += 1
    }

    val assign = assignCol(centroids)
    (dfk.withColumn("cluster", assign(col(groupCol), col(vecCol))), centroids)
  }

  /** Single (ungrouped) k-means: one group spanning the whole frame. */
  def fit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      seed: Long): (DataFrame, Array[Array[Float]]) = {
    val g = df.withColumn("__g", lit(0L))
    val (assigned, cents) = fitGrouped(g, "__g", idCol, vecCol, Map(0L -> k), iters, seed)
    (assigned.drop("__g"), cents(0L))
  }
}
