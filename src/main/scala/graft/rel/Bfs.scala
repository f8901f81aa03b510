package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] Multi-source BFS hop distance — the discrete sibling of
  * [[PageRank.personalized]]: label every node with its exact hop
  * distance from the nearest seed (crawl depth from trusted roots, "how
  * many links from a curated page", staleness tiers). Pure BSP set
  * algebra — no weights, no floats, no tie-breaking: the frontier at
  * round i is exactly the unlabeled out-neighborhood of the round-(i−1)
  * frontier, so ANY engine replaying the schedule produces the identical
  * labeling, and the oracle does (unrolled CTEs).
  *
  * Per round the plan is one equality join of edges against the (shrinking)
  * frontier on `src`, a distinct on the found set, and an anti-join
  * against the labels so far — node-key shuffles only, nothing data-sized
  * broadcast (the [[PageRank]] plan rule); lineage truncates on the same
  * cadence. The labels table is referenced once per round (the anti-join)
  * and the frontier once (the edge join), so an uncheckpointed span of r
  * rounds is a 2^r-leaf plan like [[KCore]]'s — the cadence bounds it.
  */
object Bfs {

  /** `nodes(node)`, `edges(src, dst)` (directed; parallel edges and
    * self-loops are harmless), `seeds(node)` (rows outside `nodes` are
    * ignored). Returns one row per node: `(node, dist)` with `dist` the
    * hop distance from the nearest seed, or −1 if not reached within
    * `maxHops` (the "outside this crawl horizon" certificate). */
  def run(
      nodes: DataFrame,
      edges: DataFrame,
      seeds: DataFrame,
      maxHops: Int,
      checkpointEvery: Int = 4): DataFrame = {
    require(maxHops >= 0, s"maxHops must be non-negative, got $maxHops")
    require(checkpointEvery > 0, s"checkpointEvery must be positive, got $checkpointEvery")
    val e = edges.select(col("src"), col("dst"))
    var labels = nodes.select(col("node"))
      .join(seeds.select(col("node")).distinct(), Seq("node"), "left_semi")
      .select(col("node"), lit(0).as("dist"))
    var frontier = labels.select("node")
    var i = 0
    while (i < maxHops) {
      val found = e
        .join(frontier.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .select(col("dst").as("node"))
        .distinct()
        .join(labels.select("node"), Seq("node"), "left_anti")
        // stay closed over the node set (edges may point outside it)
        .join(nodes.select("node"), Seq("node"), "left_semi")
        .select(col("node"), lit(i + 1).as("dist"))
      labels = labels.unionByName(found)
      frontier = found.select("node")
      i += 1
      if (i % checkpointEvery == 0 && i < maxHops) {
        labels = labels.localCheckpoint()
        frontier = frontier.localCheckpoint()
      }
    }
    nodes.select(col("node"))
      .join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("dist"), lit(-1)).as("dist"))
  }
}
