package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] Semi-supervised LABEL PROPAGATION — the second canonical
  * iterative-join workload next to [[PageRank]] (weak-label spreading for
  * training-data curation: a small human-labeled seed set plus a
  * similarity/link graph labels the rest of the corpus). Made
  * oracle-portable the same way: labels are integers, votes are integer
  * counts, and the tie rule is deterministic (max vote count, ties to the
  * SMALLEST label), so any engine replaying the same schedule produces
  * the identical assignment — no randomness, no float scores.
  *
  * Per superstep: labeled frontier fans out across `edges` (one shuffle
  * on src), votes aggregate per (dst, label) then reduce to the argmax
  * via an integer `max(struct(count, -label))` (one shuffle on dst — the
  * struct-max trick keeps the argmax inside a codegen'd aggregate instead
  * of a window), and the node set left-joins the verdicts back. Seeds are
  * CLAMPED (they never change — the standard semi-supervised variant);
  * an unlabeled node with no labeled in-neighbors stays unlabeled; a
  * previously-labeled node keeps its label when a round brings no votes.
  * Same cost shape as every BSP superstep — the edge table shuffles only
  * on its join keys, nothing data-sized is broadcast — and the same
  * periodic `localCheckpoint` lineage truncation as PageRank (cadence is
  * semantics-free, pinned in LabelPropSpec).
  */
object LabelProp {

  /** `nodes(node)`, `seeds(node, label)` (label non-null, one row per
    * seed node), `edges(src, dst)`. Returns `(node, label)` after `iters`
    * supersteps; `label` is null for nodes no label ever reached. */
  def run(
      nodes: DataFrame,
      seeds: DataFrame,
      edges: DataFrame,
      iters: Int,
      checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(checkpointEvery > 0, s"checkpointEvery must be positive, got $checkpointEvery")
    val seedLab = seeds.select(col("node"), col("label").cast("long").as("seed_label"))
    var lab = nodes
      .join(seedLab, Seq("node"), "left")
      .select(col("node"), col("seed_label").as("label"))
    var i = 0
    while (i < iters) {
      val votes = lab
        .filter(col("label").isNotNull)
        .select(col("node").as("src"), col("label"))
        .join(edges, "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
      // argmax by (count, -label): struct ordering compares count first,
      // then the negated label — i.e. ties break to the smallest label —
      // all inside one integer aggregate
      val pick = votes
        .groupBy("dst")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("best"))
        .select(col("dst").as("node"), (-col("best.nl")).as("vote"))
      lab = lab
        .join(pick, Seq("node"), "left")
        .join(seedLab, Seq("node"), "left")
        .select(
          col("node"),
          coalesce(col("seed_label"), col("vote"), col("label")).as("label"))
      i += 1
      if (i % checkpointEvery == 0 && i < iters) lab = lab.localCheckpoint()
    }
    lab
  }
}
