package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] Point-in-interval range join, bucketed. Spark plans
  * `l JOIN r ON p BETWEEN s AND e` as a broadcast-nested-loop (or a
  * cartesian when neither side fits a broadcast) — O(|L|·|R|) comparisons,
  * the classic scale killer for event-to-window attribution. Re-shaped for
  * Spark's execution model: intervals explode into the fixed-width buckets
  * they cover, points map to their single bucket, and the match becomes an
  * EQUI-join on (bucket, keys) + an exact residual filter. Each true
  * (point, interval) pair meets in exactly one bucket (the point's), so no
  * post-dedup is needed; cost is one shuffle of |L| + Σ⌈len/W⌉ rows instead
  * of a quadratic loop, and Catalyst plans a plain shuffled hash / sort-merge
  * join that AQE can skew-split.
  *
  * Intervals are half-open `[start, end)` — the idiomatic time-window form
  * (adjacent windows never double-match a boundary point).
  *
  * `bucketWidth` tunes the explode factor: W ≈ the typical interval length
  * gives ~2 exploded rows per interval; W far below it inflates the
  * interval side, W far above it degrades the join to few giant buckets.
  */
object RangeJoin {

  /** @param keys equi-key pairs `(pointCol, intervalCol)` joined alongside
    *             the bucket (e.g. user id); may be empty for pure ranges */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(
      (points.columns ++ intervals.columns).distinct.size == points.columns.length + intervals.columns.length,
      "points and intervals must not share column names (both sides are emitted)")
    require(!points.columns.contains("_bucket") && !intervals.columns.contains("_bucket"),
      "inputs must not already carry a _bucket column")
    val p = points.withColumn("_bucket", floor(col(pointCol) / bucketWidth)).alias("_P")
    // end is exclusive, but exploding through floor(end/W) (one bucket past
    // the last covered one at worst) is cheaper than special-casing the
    // boundary — the residual filter keeps correctness either way. Empty /
    // malformed intervals (end <= start) are dropped up front: a half-open
    // [s, s) matches nothing, and Spark's sequence() counts DOWN when
    // start > end, which would fabricate bucket rows.
    val i = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("_bucket", explode(sequence(floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
      .alias("_I")
    val cond = keys.foldLeft(col("_P._bucket") === col("_I._bucket")) { case (c, (pk, ik)) =>
      c && col(s"_P.$pk") === col(s"_I.$ik")
    }
    p.join(i, cond)
      .filter(col(s"_I.$startCol") <= col(s"_P.$pointCol") && col(s"_P.$pointCol") < col(s"_I.$endCol"))
      .select(
        points.columns.map(c => col(s"_P.$c")) ++
          intervals.columns.map(c => col(s"_I.$c")): _*)
  }
}
