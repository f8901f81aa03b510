package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] k-CORE decomposition by parallel peeling — the standard
  * graph-density filter a training-data pipeline runs over similarity /
  * co-occurrence / link graphs (spam and boilerplate live in the sparse
  * shell; the dense core is the high-signal community). Matula–Beck
  * peeling, BSP form: every superstep recomputes degrees within the
  * surviving subgraph and drops EVERY node below k at once — the fixpoint
  * (each survivor has ≥ k surviving neighbors) is the k-core, reached in
  * at most diameter-ish rounds and IDEMPOTENT afterwards, so a fixed
  * round budget needs no driver-side convergence poll: extra rounds are
  * no-ops and the emitted `converged` flag (min over survivors of
  * in-core-degree ≥ k — a one-row aggregate, free) certifies the budget
  * sufficed. Per round the cost is two semi-joins of edges against the
  * survivor set plus one degree aggregate — equality shuffles on the node
  * key only, nothing data-sized broadcast, no windows; lineage truncates
  * on the [[PageRank]] cadence (semantics-free, spec-pinned).
  */
object KCore {

  /** Survivors of the k-core of the undirected graph given by `edges
    * (src, dst)` (direction/duplication ignored, self-loops dropped)
    * after `rounds` peel supersteps: `(node, cdeg, converged)` with
    * `cdeg` the node's degree WITHIN the survivor set and `converged` =
    * 1 on every row iff no survivor sits below k (the fixpoint
    * certificate — always 1 when `rounds` covers the peel depth). */
  def decompose(
      edges: DataFrame,
      k: Int,
      rounds: Int,
      checkpointEvery: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be non-negative, got $rounds")
    require(checkpointEvery > 0, s"checkpointEvery must be positive, got $checkpointEvery")
    val canon = Triangles.canonical(edges)
    def degreesWithin(live: DataFrame): DataFrame = {
      val alive = canon
        .join(live.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(live.select(col("node").as("v")), Seq("v"), "left_semi")
      // explode, not unionAll(alive, alive): each round's plan references
      // `live` twice (the semi-joins), not four times — an uncheckpointed
      // span of r rounds is a 2^r-leaf plan instead of 4^r, which is the
      // difference between the analyzer finishing and not at the default
      // cadence (2^4 per span vs 4^4·…)
      alive.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node")
        .agg(count(lit(1)).as("cdeg"))
    }
    var live = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .distinct()
    var i = 0
    while (i < rounds) {
      live = degreesWithin(live).filter(col("cdeg") >= k).select("node")
      i += 1
      if (i % checkpointEvery == 0 && i < rounds) live = live.localCheckpoint()
    }
    // left join, not the bare degree agg: a survivor whose last neighbor
    // died in the final round has NO edge row — it must surface as cdeg 0
    // (and fail the flag), not vanish from the output
    val fin = live
      .join(degreesWithin(live), Seq("node"), "left")
      .select(col("node"), coalesce(col("cdeg"), lit(0L)).as("cdeg"))
    fin.crossJoin(
      fin.agg(
        coalesce(min(when(col("cdeg") >= k, 1L).otherwise(0L)), lit(1L))
          .as("converged")))
  }
}
