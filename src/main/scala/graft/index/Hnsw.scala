package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] Hierarchical navigable-graph ANN index (HNSW, Malkov &
  * Yashunin TPAMI 2018), Spark-native and fully deterministic: instead
  * of random level draws, a node is on layer `i` iff
  * `xxhash64(vec_id) mod shrink^i == 0` — the same geometric level
  * distribution (expected n/shrink^i nodes per layer), but reproducible
  * and NESTED by construction (`shrink^(i+1) | h ⇒ shrink^i | h`),
  * which is the property the descend relies on. Each layer carries its
  * own k-NN graph over its members ([[KnnJoin.knnGraph]]); search
  * brute-scores the (≤ `topCap`-sized) top layer as seeds, then
  * descends: each layer's beam result seeds the next layer's
  * [[GraphSearch.searchFrom]] walk — the coarse layers do the ROUTING
  * that v35 borrows from IVF, so the graph family stands alone
  * end-to-end.
  *
  * Scale shape: layer sizes are geometric, so build cost is dominated
  * by the layer-0 graph (the same probed build the flat graph pays) and
  * total extra storage is < 1/(shrink−1) of layer-0's. Search touches
  * O(layers·rounds·beam·deg) vectors per query — logarithmic in n via
  * the layer count, the classic HNSW argument; nothing data-sized is
  * ever broadcast (the per-layer walks inherit GraphSearch's plan
  * shape: graph shuffles once on src, exchange reused across hops).
  */
object Hnsw {

  /** One layer: its member vectors and its k-NN graph (src, dst, …). */
  final case class Layer(nodes: DataFrame, graph: DataFrame)

  /** Build nested layers bottom-up over `nodes(vec_id, embedding)`:
    * layer 0 is all of `nodes`; layer i keeps members with
    * `xxhash64(vec_id) mod shrink^i == 0`, until a layer would have
    * ≤ `topCap` members (that layer becomes the brute-forceable top).
    * `model` (optional) routes each layer's graph build through the
    * probed IVF scan instead of the exact O(n²) path — the scale form.
    * `layer0Graph` (optional) supplies an already-built degree-`k` graph
    * for the full corpus — the deploy-once contract: layer 0 dominates
    * build cost (upper layers are geometrically smaller), so a cached or
    * saved artifact should be reused rather than rebuilt. Returned
    * top-first. */
  def build(
      nodes: DataFrame,
      k: Int,
      model: Option[IvfModel] = None,
      shrink: Int = 16,
      topCap: Long = 256L,
      layer0Graph: Option[DataFrame] = None): Seq[Layer] = {
    require(k >= 1 && shrink >= 2 && topCap >= 1,
      s"bad k=$k shrink=$shrink topCap=$topCap")
    val layers = Seq.newBuilder[Layer]
    var cur = nodes.select(col("vec_id"), col("embedding"))
    var mod = 1L
    var n = cur.count()
    var done = false
    while (!done) {
      val g =
        if (mod == 1L) layer0Graph.getOrElse(KnnJoin.knnGraph(cur, k, model))
        else KnnJoin.knnGraph(cur, k, model)
      layers += Layer(cur, g)
      val nextMod = mod * shrink
      val next = nodes
        .filter(pmod(xxhash64(col("vec_id")), lit(nextMod)) === 0)
        .select(col("vec_id"), col("embedding"))
      val nextN = next.count()
      // stop ONLY when the CURRENT layer is brute-forceable as the top:
      // search crossJoins a broadcast of the whole top layer, so the
      // `≤ topCap` contract must hold unconditionally — a degenerate
      // (tiny) upper layer is harmless (its graph may be empty; the
      // descent just carries the seeds through), an OVERSIZED top is
      // not. The one exception is nextN == 0 (the hash rule left nothing
      // to shrink to — astronomically unlikely at n > topCap under a
      // uniform 64-bit hash): then the current layer stays the top and
      // the broadcast bound degrades to n, documented here.
      if (n <= topCap || nextN == 0L) done = true
      else { cur = next; mod = nextMod; n = nextN }
    }
    layers.result().reverse
  }

  /** Descend-and-refine search: brute-score the top layer's members as
    * seeds (bounded: the build capped it near `topCap`), then walk each
    * layer with [[GraphSearch.searchFrom]], the result seeding the next
    * layer down. Returns layer-0's `(query_id, vec_id, rnk, dist2)`,
    * `rnk ≤ k`. `perLayerK` controls how many carriers descend (HNSW's
    * ef at the upper layers). */
  def search(
      queries: DataFrame,
      layers: Seq[Layer],
      k: Int,
      beam: Int,
      rounds: Int,
      perLayerK: Int = 8): DataFrame = {
    require(layers.nonEmpty, "empty layer stack")
    require(k >= 1 && beam >= k && perLayerK >= 1, s"bad k=$k beam=$beam perLayerK=$perLayerK")
    val q = queries.select(col("query_id"), col("qvec"))
    // top layer: every member is a seed candidate (the layer is
    // topCap-bounded by the build — this is a broadcast-sized relation)
    var seeds = graft.vector.TopK.perQuery(
      q.crossJoin(broadcast(layers.head.nodes.select(col("vec_id"), col("embedding"))))
        .select(
          col("query_id"),
          graft.vector.VectorOps.l2Sq(col("embedding"), col("qvec")).as("dist2"),
          col("vec_id")),
      perLayerK)
      .select("query_id", "vec_id")
    // intermediate layers carry perLayerK seeds down; the final layer's
    // walk (layer 0 — or the top itself in a single-layer stack) returns
    // the full top-k
    val mids = if (layers.length > 1) layers.tail.init else Nil
    mids.foreach { layer =>
      seeds = GraphSearch
        .searchFrom(q, layer.graph, layer.nodes, seeds,
          k = math.min(perLayerK, beam), beam = beam, rounds = rounds)
        .select("query_id", "vec_id")
    }
    val last = layers.last
    GraphSearch.searchFrom(q, last.graph, last.nodes, seeds, k, beam, rounds)
  }
}
