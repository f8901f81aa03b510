package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] k-NN join as a named table-level operator: for every row
  * of `queries`, the k nearest rows of `corpus` by squared L2 — the batched
  * framing of the reference's per-query search (quake_min.py:147-168 /
  * 212-215) that a relational user expects ("join these two tables on
  * nearest-neighbor").
  *
  * Two physical strategies, one logical contract:
  *  - `exact`: broadcast the (small) query side against a full corpus scan
  *    — O(|Q|·|C|) distances but one scan, no index; right when Q is tiny
  *    or C fits a single pass (this is also the recall oracle);
  *  - `ivf`: probe a prebuilt two-level index (APS, quake_min.py:139-145)
  *    — scans only the probed partitions per query; right at corpus scale.
  *
  * Output for both: `(query_id, rank, vec_id, dist2)`, rank 1..k by
  * ascending distance, ties broken by vec_id.
  */
object KnnJoin {

  /** Brute-force exact k-NN join; `queries` is broadcast. */
  def exact(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    IvfSearch.exactTopK(
      corpus.select("vec_id", "embedding"),
      normalizeQueries(queries),
      k)

  /** IVF-accelerated approximate k-NN join over a prebuilt index.
    * `broadcastProbes = false` is the corpus-sized-batch form — see
    * [[IvfSearch.search]]; [[knnGraph]] passes it because its query batch
    * IS the node set. */
  def ivf(
      model: IvfModel,
      queries: DataFrame,
      k: Int,
      targetRecall: Double = 0.9,
      maxProbe: Int = 64,
      broadcastProbes: Boolean = true): DataFrame =
    IvfSearch.search(
      model, normalizeQueries(queries), IvfSearch.Params(k, targetRecall, maxProbe), broadcastProbes)

  /** LSH-bucketed approximate COSINE k-NN join — the index-free scale path
    * for similarity search: both sides take the same random-hyperplane
    * sign sketch ([[graft.text.Dedup.hyperplanes]]), candidates meet
    * through an equality join on banded bucket hashes (never an all-pairs
    * cross join), and only the candidates pay the exact-cosine rerank.
    * Per-query top-k rides the bounded-heap aggregator on negated cosine.
    *
    * Contract matches the other strategies — `(query_id, rank, vec_id,
    * cos)`, rank 1..k by DESCENDING cosine, ties by vec_id — but recall is
    * sketch-probabilistic. The trade-off, quantitatively: a pair at angle
    * θ agrees on one sign bit w.p. 1−θ/π, so a band of r = nPlanes/bands
    * rows collides w.p. (1−θ/π)^r and candidate recall is
    * 1−(1−(1−θ/π)^r)^bands. Fewer rows per band ⇒ higher recall but
    * coarser buckets (more candidates to rerank — toward all-pairs as
    * r→0); more bands at fixed r buys recall linearly in sketch/join work.
    * E.g. at cos 0.5 (θ=60°): r=4,bands=8 → ≈0.83; r=8,bands=4 → ≈0.14.
    * The v11 driver query measures lsh-vs-exact recall@10 end-to-end and
    * KnnJoinSpec pins both it and the planted-neighbor hit rate.
    *
    * @param dim embedding dimensionality (plane matrix width)
    */
  def lsh(
      queries: DataFrame,
      corpus: DataFrame,
      dim: Int,
      k: Int,
      nPlanes: Int = 16,
      bands: Int = 4): DataFrame = {
    require(nPlanes % bands == 0, "bands must divide nPlanes")
    import graft.text.Dedup
    val planes = Dedup.hyperplanes(dim, nPlanes)
    val q = normalizeQueries(queries)
    val c = corpus.select("vec_id", "embedding")

    def banded(df: DataFrame, idCol: String, vecCol: String) = df
      .select(col(idCol), Dedup.bandHashes(Dedup.sketchBits(col(vecCol), planes), nPlanes, bands))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    // narrow-key candidate join (ids only), wide columns rejoin after dedup
    val cands = banded(q, "query_id", "qvec")
      .join(banded(c, "vec_id", "embedding"), Seq("band", "band_hash"))
      .select("query_id", "vec_id")
      .distinct()

    val reranked = cands
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("vec_id"))
      .withColumn("cos", graft.vector.VectorOps.cosine(col("qvec"), col("embedding")))
      // negate so the ascending (dist, id) heap yields descending cosine
      .withColumn("dist2", -col("cos"))
    graft.vector.TopK.perQuery(reranked, k)
      .select(col("query_id"), col("rank"), col("vec_id"), (-col("dist2")).as("cos"))
  }

  /** Multi-probe LSH k-NN join (Lv et al., VLDB 2007): the [[lsh]]
    * backend plus QUERY-SIDE bucket perturbation — for every band, the
    * query also probes the `rows` buckets whose sketch differs in exactly
    * one bit, the buckets a true neighbor most likely fell into when a
    * single hyperplane voted the other way. Candidate recall rises from
    * `1−(1−p^r)^B` to `1−(1−p^r −r·p^(r−1)(1−p))^B` (p = per-bit
    * agreement, r = rows/band, B = bands) for the cost of (r+1)× more
    * QUERY bucket rows — the corpus is sketched, banded, and joined
    * EXACTLY as in single-probe (bit flips happen before the bucket
    * hash, on the delta-sized side), which is the entire point at scale:
    * recall of many more hash tables without touching the corpus index.
    * Single-probe candidates are a strict subset (the unperturbed hash is
    * probed too — spec-pinned), so recall can only rise. */
  def lshMultiProbe(
      queries: DataFrame,
      corpus: DataFrame,
      dim: Int,
      k: Int,
      nPlanes: Int = 16,
      bands: Int = 4): DataFrame = {
    require(nPlanes % bands == 0, "bands must divide nPlanes")
    import graft.text.Dedup
    val planes = Dedup.hyperplanes(dim, nPlanes)
    val rows = nPlanes / bands
    val q = normalizeQueries(queries)
    val c = corpus.select("vec_id", "embedding")

    val cBanded = c
      .select(col("vec_id"), Dedup.bandHashes(Dedup.sketchBits(col("embedding"), planes), nPlanes, bands))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    // query probes: per band, the original bucket + one bucket per flipped
    // bit — probe index pi ∈ [0, rows], pi = 0 is the identity probe
    val qBanded = q
      .select(col("query_id"), Dedup.sketchBits(col("qvec"), planes).as("bits"))
      .select(
        col("query_id"),
        posexplode(transform(
          sequence(lit(0), lit(bands * (rows + 1) - 1)),
          idx => {
            val bnd = (idx / (rows + 1)).cast("int")
            val pi = pmod(idx, lit(rows + 1)).cast("int")
            xxhash64(transform(
              slice(col("bits"), bnd * rows + 1, lit(rows)),
              (b, i) => when(i === pi - 1, lit(1) - b).otherwise(b)))
          })))
      .select(
        col("query_id"),
        (col("pos") / (rows + 1)).cast("int").as("band"),
        col("col").as("band_hash"))

    val cands = qBanded
      .join(cBanded, Seq("band", "band_hash"))
      .select("query_id", "vec_id")
      .distinct()

    val reranked = cands
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("vec_id"))
      .withColumn("cos", graft.vector.VectorOps.cosine(col("qvec"), col("embedding")))
      .withColumn("dist2", -col("cos"))
    graft.vector.TopK.perQuery(reranked, k)
      .select(col("query_id"), col("rank"), col("vec_id"), (-col("dist2")).as("cos"))
  }

  /** IVFADC-compressed approximate k-NN join — the fourth backend, same
    * output contract as [[exact]]/[[ivf]]: APS chooses the probe set
    * (quake_min.py:139-145), the probed partitions are scanned as RESIDUAL
    * byte codes via per-(query, partition) lookup tables
    * ([[graft.vector.Pq.ivfAdcResidualTopK]], Jégou et al. 2011), and the
    * ADC top-`rerankN` is re-ranked exactly against the float vectors, so
    * reported `dist2` is TRUE squared L2 like the other backends. Right
    * when the corpus's float vectors don't fit memory but its m-byte codes
    * do — the scan touches codes only; floats are read for ≤ |Q|·rerankN
    * rows by a bounded gather join.
    *
    * `codes` is the [[graft.vector.Pq.encodeResiduals]] table for
    * (`model`, `pqModel`) — encoded once, reused across query batches like
    * the index itself.
    *
    * `rerankN = 0` (the default) means density-aware: the candidate depth
    * scales with the mean PROBED candidate count via
    * [[graft.vector.Pq.adaptiveDepthProbed]] (one metadata-sized
    * aggregate over the probe set), because a fixed depth calibrated at
    * one density fails at 10× (see adaptiveDepth's measurements) — and a
    * total-corpus-derived depth would make per-query rerank work O(n)
    * even when the probes scan a sliver. */
  def pq(
      model: IvfModel,
      pqModel: graft.vector.PqModel,
      codes: DataFrame,
      queries: DataFrame,
      k: Int,
      rerankN: Int = 0,
      targetRecall: Double = 0.9,
      maxProbe: Int = 64): DataFrame = {
    val q = normalizeQueries(queries)
    val cents = model.partitions.map(p => p.pid -> p.centroid).toMap
    // cached (CacheScope-scoped): the depth aggregate below is an action,
    // and the ADC pipeline consumes the same probe set — uncached, the
    // crossJoin+window probe-choice subtree would execute twice per call
    val probes = graft.CacheScope.track(
      IvfSearch.chooseProbes(model, q, IvfSearch.Params(k, targetRecall, maxProbe)).cache())
    // density-aware depth from the PROBED count, not the total indexed
    // size: the ADC ordering only ranks the probed subset, so per-query
    // rerank work stays proportional to what the probes actually scan
    val depth =
      if (rerankN > 0) rerankN
      else graft.vector.Pq.adaptiveDepthProbed(probes, 100)
    val adc = graft.vector.Pq.ivfAdcResidualTopK(
      codes, pqModel, cents, probes.select("query_id", "partition_id"), q, math.max(k, depth))
    graft.vector.Pq.rerankExact(adc, model.vectors, q, k)
  }

  /** Int8 scalar-quantized approximate k-NN join — the fifth backend, the
    * 4× compression tier between [[exact]] (raw floats) and [[pq]] (16×
    * IVFADC): the corpus is scanned as per-dimension byte codes
    * ([[graft.vector.Sq]], asymmetric ADC — queries stay float), and the
    * ADC top-`rerankN` is re-ranked exactly so reported `dist2` is TRUE
    * squared L2 like the other backends. No index, no training state
    * beyond a per-dimension min/max grid — the right first stop when the
    * float corpus outgrows memory but byte codes fit, before paying PQ's
    * recall loss. `codes` is the [[graft.vector.Sq.encode]] table for
    * `model` — encoded once, reused across query batches.
    *
    * `rerankN = 0` (the default) means density-aware depth via
    * [[graft.vector.Pq.adaptiveDepth]] — one `count()` of the code table
    * (metadata-cheap next to the ADC scan itself). Here the count IS the
    * scanned-subset size: SQ is the index-free full-scan tier, every code
    * row enters the ADC ordering, so depth ∝ n is the honest bound (the
    * probed tiers derive theirs from the probe set instead). */
  def sq(
      model: graft.vector.Sq.SqModel,
      codes: DataFrame,
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      rerankN: Int = 0): DataFrame = {
    val q = normalizeQueries(queries)
    val depth =
      if (rerankN > 0) rerankN
      else graft.vector.Pq.adaptiveDepth(codes.count(), 30)
    val adc = graft.vector.Sq.adcTopK(codes, model, q, math.max(k, depth))
    graft.vector.Pq.rerankExact(adc, corpus.select("vec_id", "embedding"), q, k)
  }

  /** Filtered (metadata-constrained) exact k-NN — vector-engine "search
    * with a payload filter": top-k among only the corpus rows satisfying
    * `pred`, evaluated against the corpus row's own columns. The filter
    * runs BEFORE any distance arithmetic, inside the same codegen stage
    * as the scan (source-pushable shapes — equality, range, IN — prune at
    * the parquet reader itself; computed predicates like `label % 3 = 0`
    * evaluate right after the scan, still upstream of every distance), so
    * a selective filter makes filtered search CHEAPER than unfiltered —
    * never a post-filter of a top-k that would under-fill k. Same output
    * contract as [[exact]]. */
  def exactFiltered(
      queries: DataFrame,
      corpus: DataFrame,
      pred: org.apache.spark.sql.Column,
      k: Int): DataFrame =
    exact(queries, corpus.filter(pred), k)

  /** Filtered IVF k-NN: APS chooses the probe set exactly as [[ivf]]
    * (probe choice sees the full index — the filter does not move
    * centroids), then the probed partitions are scanned restricted to
    * the ids in `keep` (the predicate's pre-filtered id set) via a
    * left-semi join BEFORE distance compute. When `keep` fits the
    * broadcast threshold the restriction is shuffle-free; past it, AQE
    * degrades the semi-join to a shuffle of (probed-scan ids × keep
    * keys) — key bytes, not vectors. A corpus that carries its metadata
    * IN the index table can instead filter inline like [[exactFiltered]]
    * and skip the join entirely (the layout a production deployment
    * should choose); this entry point serves the side-table layout.
    *
    * Selective filters thin each probed cell, so matching ranks of the
    * filtered exact answer needs MORE probes than unfiltered search at
    * equal recall — callers compensate with `targetRecall`/`maxProbe`
    * (KnnJoinSpec pins recall vs [[exactFiltered]] at the defaults). */
  def ivfFiltered(
      model: IvfModel,
      queries: DataFrame,
      keep: DataFrame,
      k: Int,
      targetRecall: Double = 0.9,
      maxProbe: Int = 64): DataFrame = {
    val q = normalizeQueries(queries)
    val probes = IvfSearch
      .chooseProbes(model, q, IvfSearch.Params(k, targetRecall, maxProbe))
      .select("query_id", "partition_id", "qvec")
    val kept = model.vectors.join(keep.select("vec_id"), Seq("vec_id"), "left_semi")
    val scanned = kept
      .join(broadcast(probes), Seq("partition_id"))
      .withColumn("dist2", graft.vector.VectorOps.l2Sq(col("qvec"), col("embedding")))
    graft.vector.TopK.perQuery(scanned, k)
  }

  /** Accept either `(query_id, qvec)` or `(vec_id, embedding)` shapes. */
  /** Range (radius) search — FAISS's `range_search` as a join: EVERY
    * corpus row within squared L2 `r2` of each query, unranked. There is
    * no top-k heap because the result size is data-dependent by design
    * (dense neighborhoods return more); callers bound it with the radius.
    * Exact path: broadcast queries against one corpus scan — the same
    * plan family as [[exact]], minus the heap (a pure filter keeps the
    * whole pipeline in one codegen stage). Output
    * `(query_id, vec_id, dist2)`, dist2 ≤ r2. */
  def radiusExact(queries: DataFrame, corpus: DataFrame, r2: Double): DataFrame =
    corpus
      .select("vec_id", "embedding")
      .crossJoin(broadcast(normalizeQueries(queries)))
      .withColumn("dist2", graft.vector.VectorOps.l2Sq(col("qvec"), col("embedding")))
      .filter(col("dist2") <= r2)
      .select("query_id", "vec_id", "dist2")

  /** IVF-pruned radius search: scan only the APS-probed partitions, then
    * range-filter — approximate (an unprobed partition can hide in-range
    * rows near its boundary; KnnJoinSpec pins recall against
    * [[radiusExact]]), but the scan shrinks from the whole corpus to the
    * probed cells exactly as in [[ivf]]. */
  def radiusIvf(
      model: IvfModel,
      queries: DataFrame,
      r2: Double,
      targetRecall: Double = 0.9,
      maxProbe: Int = 64): DataFrame = {
    val probes = IvfSearch
      .chooseProbes(model, normalizeQueries(queries), IvfSearch.Params(1, targetRecall, maxProbe))
      .select("query_id", "partition_id", "qvec")
    model.vectors
      .join(broadcast(probes), Seq("partition_id"))
      .withColumn("dist2", graft.vector.VectorOps.l2Sq(col("qvec"), col("embedding")))
      .filter(col("dist2") <= r2)
      .select("query_id", "vec_id", "dist2")
  }

  /** Offline k-NN GRAPH build — a node set joined against itself with
    * self-edges removed: the precursor artifact of graph-ANN index builds
    * (NN-descent / HNSW seed graphs), semantic-dedup neighborhoods, and
    * label propagation. Exact path = one [[exact]] self-join at `k + 1`
    * (the self hit sits inside the heap at distance 0, so k real
    * neighbors always survive) followed by a re-rank after dropping it —
    * every node emits exactly k out-edges ranked by `(dist2, dst)`. At
    * corpus scale callers pass the prebuilt IVF `model` and each node
    * scans only its APS-probed cells exactly as in [[ivf]] (approximate —
    * recall pinned against the exact graph in KnnJoinSpec; candidates are
    * closed over `nodes` even when the model indexes a superset, so
    * out-degree may fall below k on that path). Output
    * `(src, dst, rnk, dist2)`. */
  def knnGraph(nodes: DataFrame, k: Int, model: Option[IvfModel] = None): DataFrame = {
    val topk = model match {
      case None => exact(nodes, nodes, k + 1)
      case Some(m) =>
        // the model may index a SUPERSET of `nodes` (the usual deployment:
        // one corpus index, many node subsets) — keep the graph closed
        // over `nodes` by semi-joining the scanned candidates back to the
        // node set; out-degree can then fall below k (approximate path —
        // the recall pin in KnnJoinSpec covers the drop).
        // broadcastProbes = false: the query batch here is the ENTIRE node
        // set, so the probe side is |nodes|·nprobe rows each carrying a
        // d-float qvec — data-sized, and a forced broadcast of it is
        // rebuilt per executor (multi-GB at 100× corpus). Both sides
        // shuffle on partition_id instead; at fixture scale AQE measures
        // the materialized probe side and converts back to a runtime
        // broadcast when it is genuinely small (pinned in PlanAuditSpec:
        // no broadcast HINT of a nodes-derived relation).
        ivf(m, nodes, k + 1, broadcastProbes = false)
          .join(nodes.select(col("vec_id")), Seq("vec_id"), "left_semi")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("dist2").asc, col("vec_id").asc)
    topk
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id").as("src"), col("vec_id").as("dst"), col("rnk"), col("dist2"))
  }

  /** One NN-DESCENT refinement round (Dong et al., WWW'11) over a k-NN
    * graph: the local-search step every graph-ANN index build (NN-descent
    * proper, HNSW link repair) iterates — "my neighbor's neighbors are
    * probably my neighbors". Candidates for each node are its current
    * undirected neighborhood's neighborhoods (forward ∪ reverse edges,
    * joined once on the node key — ≤ (2k)² candidates per node, bounded
    * fan-out, NEVER an all-pairs product), unioned with the current
    * edges so the refined top-k re-ranks a SUPERSET of what it had:
    * per-node recall against the exact graph is monotonically
    * non-decreasing by construction (pinned in KnnJoinSpec). Distances
    * are recomputed exactly for the candidate pairs through two equality
    * joins against the vector table; per-src top-k rides the rank window
    * (WindowGroupLimit pushes the partial limit map-side). Output matches
    * [[knnGraph]]: `(src, dst, rnk, dist2)`. */
  def nnDescentRound(graph: DataFrame, nodes: DataFrame, k: Int): DataFrame =
    nnDescentRound(graph, nodes, k, 1.0, 0L)

  /** [[nnDescentRound]] with Dong et al.'s candidate SAMPLING lever
    * (§2.3 "sampling", rate ρ): each undirected edge enters the
    * neighbor-of-neighbor expansion with probability `rho`, cutting the
    * expansion from (2k)² to (2ρk)² candidate pairs per node — the knob
    * that makes multi-round construction affordable at corpus scale.
    * The CURRENT edges always stay in the candidate set un-sampled, so
    * the refined top-k still re-ranks a superset of what it had and
    * per-node recall stays monotonically non-decreasing (the v34
    * contract). Sampling is deterministic (edge-keyed hash, salted by
    * `salt` so successive rounds thin DIFFERENT pairs — without the
    * salt a dropped pair is dropped every round and convergence
    * stalls). */
  def nnDescentRound(
      graph: DataFrame,
      nodes: DataFrame,
      k: Int,
      rho: Double,
      salt: Long): DataFrame = {
    val e = graph.select("src", "dst")
    val undAll = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val und =
      if (rho >= 1.0) undAll
      else undAll.filter(
        pmod(xxhash64(col("src"), col("dst"), lit(salt)), lit(1000L)) < lit((rho * 1000).toLong))
    val nn = und.as("a")
      .join(und.as("b"), col("a.dst") === col("b.src"))
      .select(col("a.src").as("src"), col("b.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
    val cands = e.unionByName(nn).distinct()
    val withDist = cands
      .join(nodes.select(col("vec_id").as("src"), col("embedding").as("emb_a")), Seq("src"))
      .join(nodes.select(col("vec_id").as("dst"), col("embedding").as("emb_b")), Seq("dst"))
      .withColumn("dist2", graft.vector.VectorOps.l2Sq(col("emb_a"), col("emb_b")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src")
      .orderBy(col("dist2").asc, col("dst").asc)
    withDist
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("src", "dst", "rnk", "dist2")
  }

  /** Index-free k-NN GRAPH CONSTRUCTION via NN-descent (Dong et al.,
    * WWW'11) — the DEFAULT scale path when no prebuilt IVF model exists:
    * seed each node with cheap deterministic ladders, then iterate
    * [[nnDescentRound]] (at a working degree above `k`, with candidate
    * sampling) until quality converges. Replaces [[knnGraph]]'s probed
    * path as the construction default because its cold cost is
    * Θ(rounds·n·kd²) candidate pairs through EQUALITY joins — no k-means
    * training, no per-node probed scan whose cost rides the cell-size
    * distribution (the fixture-roll sensitivity the probed build
    * measured at 10×: same binary, same n, 1.6× swing from corpus
    * structure alone). [[knnGraph]] with a model remains the right call
    * when the deployment already maintains the IVF index; the exact
    * path remains the oracle.
    *
    * Quality is density-dependent, like every local method: on corpora
    * with neighborhood structure the descent converges to the exact
    * graph (0.985–0.992 edge recall measured at fixture density,
    * KnnJoinSpec bar 0.9), but on a near-orthogonal corpus dense enough
    * that top-k neighbors are statistical accidents (the 10× synthetic
    * fixture: 20k unit vectors, max cosine ≈ 0.51) GLOBAL recall
    * collapses for any sublinear method — measured 0.35–0.49 here
    * regardless of extra rounds, 0.13 for random-pivot Voronoi seeding,
    * while the probed path's 0.97 rides an ≈ linear APS scan (exp
    * 1.056). True near neighbors are still found wherever they exist —
    * the v45 driver row certifies that with planted twin vectors, the
    * near-dup/semantic-dedup contract this operator serves.
    *
    * Seeding: two k-successor LADDERS, both skew-free by construction —
    *  (a) projection ladder: nodes ordered by a fixed random projection
    *      inside balanced `repartitionByRange` buckets (locality-biased:
    *      close in space ⇒ close in projection, the 1-D shadow of a
    *      space-filling curve), each node → its `kd` successors;
    *  (b) random ladder: hash-bucketed (~1k-member buckets), hash-ordered,
    *      circular successors — guarantees every node ≥ 1 seed edge
    *      (coverage) and injects the diversity pure locality seeding
    *      lacks.
    * Each descent round is localCheckpoint-materialized ([[Hnsw]]'s
    * lineage rule): nnDescentRound consumes its input ~5×, so an
    * unmaterialized 3-round fold re-evaluates the seed ~5³ times.
    *
    * Output matches [[knnGraph]]: `(src, dst, rnk, dist2)`, rnk ≤ k —
    * the final round runs at the working degree and the top-k prefix is
    * returned (the degree-prefix contract pinned in KnnJoinSpec).
    * Approximate: exact-graph recall is pinned in KnnJoinSpec at
    * fixture density; the v45 driver row certifies planted-neighbor
    * recall per run (see the quality paragraph above). */
  def knnGraphDescent(
      nodes: DataFrame,
      k: Int,
      rounds: Int = 3,
      workDegree: Int = 0,
      rho: Double = 1.0): DataFrame = {
    val c = nodes.select("vec_id", "embedding")
    // Working degree: the quality lever, measured on the fixture corpora
    // (k=5, 3 rounds, exact-graph edge recall): kd=k+3 plateaus at
    // 0.83-0.90 regardless of extra rounds (the classic small-K
    // NN-descent local optimum), kd=12 reaches 0.95, kd=16 reaches
    // 0.985-0.992 with convergence complete by round 3 — so the default
    // works at max(16, k+3) and returns the top-k prefix. Candidate
    // volume is n·(2·kd·rho)² per round; at corpus scale where that
    // dominates, `rho` (Dong et al.'s sampling) trades measured recall
    // for linear cost: rho=0.7 at kd=16 read 0.958 on the same sweep.
    val kd = if (workDegree > 0) workDegree else math.max(16, k + 3)
    val dim = c.select(size(col("embedding"))).head().getInt(0)
    val n = c.count()
    val planes = graft.text.Dedup.hyperplanes(dim, 2)
    val bucketRows = 1024L

    // (a) projection ladder — range-balanced buckets over a fixed random
    // projection, kd successors in projection order within each bucket
    val nParts = math.max(32L, n / bucketRows).toInt
    val projected = c
      .select(
        col("vec_id"),
        graft.vector.VectorOps.dot(col("embedding"), typedLit(planes.head)).as("proj"))
      .repartitionByRange(nParts, col("proj"), col("vec_id"))
      .withColumn("bkt", org.apache.spark.sql.functions.spark_partition_id().cast("long"))
    // (b) random ladder — hash buckets, hash order, CIRCULAR successors
    // (wraps via pmod below, so a bucket of size ≥ 2 covers every member)
    val hashed = c.select(
      col("vec_id"),
      pmod(xxhash64(col("vec_id")), lit(math.max(1L, n / bucketRows))).as("bkt"),
      xxhash64(col("vec_id"), lit(7L)).cast("double").as("proj"))

    def ladder(df: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("bkt").orderBy(col("proj"), col("vec_id"))
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("bkt")
      val ranked = df
        .withColumn("r", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
      ranked
        .select(
          col("vec_id").as("src"), col("bkt"), col("cnt"),
          col("r"), explode(sequence(lit(1), lit(kd))).as("j"))
        .withColumn("tr", pmod(col("r") - 1 + col("j"), col("cnt")) + 1)
        .join(
          ranked.select(col("vec_id").as("dst"), col("bkt"), col("r").as("tr")),
          Seq("bkt", "tr"))
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
    }
    val seed = ladder(projected).unionByName(ladder(hashed)).distinct()

    var g: DataFrame = seed.localCheckpoint()
    var last: DataFrame = null
    (1 to math.max(1, rounds)).foreach { i =>
      last = nnDescentRound(g, c, kd, rho, i.toLong).localCheckpoint()
      g = last.select("src", "dst")
    }
    last.filter(col("rnk") <= k)
  }

  private def normalizeQueries(queries: DataFrame): DataFrame =
    if (queries.columns.contains("query_id")) queries.select("query_id", "qvec")
    else queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
}
