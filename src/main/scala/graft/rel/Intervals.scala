package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Union-of-intervals (merge overlapping/touching intervals) per key — the
  * coverage primitive behind session stitching, ad-viewability accounting,
  * SLA uptime, and span-level PII scrub consolidation (d12's span merge is
  * the string-offset special case of this shape).
  *
  * Algorithm: one hash shuffle on `key`, then two per-key window passes —
  * (1) running max of interval end over the PRECEDING rows in (start, id)
  * order: a row starts a new island iff its start lies strictly after that
  * running coverage edge (equal = touching ⇒ merge); (2) cumulative sum of
  * the island-break flags numbers the islands (gaps-and-islands). Within
  * an island coverage is contiguous by construction, so the island's
  * covered length is simply max(end) − min(start) — no per-point sweep.
  * Everything is integer arithmetic on the caller's units.
  *
  * At 100 TB this is ONE shuffle by key plus sorted window scans — the
  * same cost shape as any per-key sessionization; no self-join, no
  * explode-per-unit-time.
  */
object Intervals {

  /** Working + output column names [[unionPerKey]] claims: an input that
    * already carries one would be silently shadowed (temps) or collide in
    * the output schema — rejected at entry, like Sampling's `_rn` guard. */
  private val Reserved =
    Seq("__pme", "__b", "__island", "island", "cov_start", "cov_end", "n_merged")

  /** Merge overlapping/touching `[startCol, endCol)` intervals per
    * `keyCol`. `idCol` breaks start-ties deterministically. Output: one
    * row per merged island `(key, island, cov_start, cov_end, n_merged)`
    * with `island` numbered from 0 in coverage order. */
  def unionPerKey(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      idCol: String): DataFrame = {
    val clashes = df.columns.toSeq.intersect(Reserved)
    require(clashes.isEmpty,
      s"input must not carry reserved interval columns: ${clashes.mkString(", ")}")
    val ord = Window.partitionBy(keyCol).orderBy(col(startCol), col(idCol))
    val prevEdge = ord.rowsBetween(Window.unboundedPreceding, -1)
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__pme", max(col(endCol)).over(prevEdge))
      .withColumn(
        "__b",
        when(col("__pme").isNull || col(startCol) > col("__pme"), 1L).otherwise(0L))
      .withColumn("__island", sum("__b").over(cum) - 1)
      .groupBy(col(keyCol), col("__island").as("island"))
      .agg(
        min(col(startCol)).as("cov_start"),
        max(col(endCol)).as("cov_end"),
        count(lit(1)).as("n_merged"))
  }

  /** Per-key coverage summary over the merged islands: island count, total
    * covered length, and the longest single island. */
  def coverage(df: DataFrame, keyCol: String, startCol: String, endCol: String, idCol: String): DataFrame =
    unionPerKey(df, keyCol, startCol, endCol, idCol)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_islands"),
        sum(col("cov_end") - col("cov_start")).as("covered"),
        max(col("cov_end") - col("cov_start")).as("longest"))
}
