package graft.rel

import graft.CacheScope
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Total-order export planner: assign every row its exact 0-based
  * position under a global sort and a balanced contiguous shard — the
  * "write the corpus out in curriculum order across k files" step at the
  * end of a pipeline. Runs as ONE `repartitionByRange` + the shared
  * [[EpochShuffle.twoLevelRank]] (per-partition subtotals → broadcast
  * bases → sequential positions) — there is no single-task global sort or
  * window anywhere, which is the property a 100 TB export lives or dies
  * by. (Contrast `orderBy.write`: correct order per file but no global
  * positions, and `row_number() OVER (ORDER BY …)`: one task.)
  */
object SortedExport {

  /** Positions and shards for a sort by (`keyCol` ASC, `idCol` ASC).
    * `keyCol` must cast to long (negate it for DESC); `idCol` must be a
    * unique numeric id — the tiebreak that makes the order total.
    * Returns `(idCol, sort_key, position, shard)`. */
  def positions(docs: DataFrame, keyCol: Column, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val s = docs.sparkSession
    import s.implicits._
    val p = s.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = CacheScope.track(
      docs
        .select(keyCol.cast("long").as("_k"), col(idCol).cast("long").as("_id"))
        .repartitionByRange(p, col("_k"), col("_id"))
        .sortWithinPartitions("_k", "_id")
        .as[(Long, Long)]
        .cache())
    EpochShuffle.twoLevelRank(s, ranged, shards).toDF(idCol, "sort_key", "position", "shard")
  }
}
