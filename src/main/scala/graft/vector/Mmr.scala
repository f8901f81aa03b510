package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [engine-added] Maximal Marginal Relevance diversity re-ranking
  * (Carbonell & Goldstein, SIGIR 1998) — the standard "don't return five
  * copies of the same document" pass a retrieval engine runs over its
  * top-N candidates:
  *
  *   next = argmax_{d ∈ C∖S} [ λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) ]
  *
  * applied greedily k times per query, where rel is the query-candidate
  * score and sim the candidate-candidate cosine. λ=1 degenerates to the
  * input ranking; λ→0 maximizes pairwise diversity.
  *
  * Scale shape: the greedy loop is inherently sequential in k but fully
  * parallel across queries — each of the k rounds is one join of the
  * remaining candidates (≤N rows per query) against the selected set
  * (≤k rows per query) on `query_id`, one max-aggregate, and one
  * window-pick. All metadata-sized: the corpus was already cut to top-N
  * per query by the upstream search; nothing here touches corpus scale.
  *
  * Determinism: each round picks its argmax on the FLOAT32-SQUEEZED
  * score (ties by `vec_id`). The mmr score mixes cosines whose last ulp
  * can wobble across engines; an ulp must not flip a selection, because
  * one flipped pick cascades through every later round. The squeeze
  * makes the pick — and therefore the whole greedy trajectory —
  * bit-reproducible, and is how the driver oracle (v20) replays the
  * exact selection in SQL.
  *
  * @param candidates per-query candidate lists:
  *                   (`query_id`, `vec_id`, `rel`, `embedding`) — `rel`
  *                   higher-is-better (e.g. cosine to the query)
  * @param k          selections per query
  * @param lambda     relevance↔diversity trade-off in [0, 1]
  * @return (`query_id`, `sel_rank` 1..k, `vec_id`, `mmr`) — `mmr` the
  *         raw (unsqueezed) score the pick won with
  */
object Mmr {

  private def f32(c: org.apache.spark.sql.Column) =
    round(c.cast("float").cast("double"), 4)

  def rerank(candidates: DataFrame, k: Int, lambda: Double): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    // The greedy loop reads the candidate set in every round — without a
    // cache the WHOLE upstream lineage (candidate generation is typically
    // a corpus-wide search) re-executes k+1 times. Candidates are top-N
    // per query, so the cache is list-sized; CacheScope drops it when the
    // caller's query finishes. Measured on the v21 pipeline: 21.0 s →
    // 2.9 s. A NaN rel (zero-norm query upstream) would sort FIRST under
    // descending order and win every round — those rows carry no usable
    // relevance signal and are dropped up front.
    val cand = graft.CacheScope.track(
      candidates
        .select("query_id", "vec_id", "rel", "embedding")
        .filter(not(isnan(col("rel").cast("double"))))
        .cache())

    var selected: DataFrame = null // (query_id, sel_rank, vec_id, mmr)
    // `_maxsim` carries the running max similarity to the selected set:
    // each round joins ONLY the newest pick (1 row per query) and folds
    // it in with greatest() — O(k·N) cosines total, where re-aggregating
    // against the full selected set every round is O(k²·N). max is exact
    // on doubles, so the fold computes the identical value (and therefore
    // the identical greedy trajectory) as the re-aggregation form.
    var remaining = cand.withColumn("_maxsim", lit(null).cast("double"))
    for (step <- 1 to k) {
      val scored = remaining.withColumn(
        "mmr",
        lit(lambda) * col("rel") -
          when(col("_maxsim").isNull, lit(0.0))
            .otherwise(lit(1.0 - lambda) * col("_maxsim")))
      val w = Window.partitionBy("query_id").orderBy(f32(col("mmr")).desc, col("vec_id"))
      // Each pick is MATERIALIZED (eager localCheckpoint, ≤|Q| rows):
      // without it round k's plan re-derives rounds 1..k−1 from scratch
      // through the join chain — an O(k²) re-execution cascade the
      // candidate cache alone does not stop (measured: the v20 driver
      // query spent 10.3 s at sf0.1 on ~150 candidate rows; truncating
      // the per-round lineage removes the cascade).
      val pick = scored
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(
          col("query_id"), lit(step).as("sel_rank"), col("vec_id"),
          col("embedding"), col("mmr"))
        .localCheckpoint()
      selected = if (selected == null) pick else selected.unionByName(pick)
      val newest = pick.select(
        col("query_id"), col("vec_id").as("_pick_vid"), col("embedding").as("_pick_emb"))
      remaining = remaining
        .join(newest, Seq("query_id"))
        .filter(col("vec_id") =!= col("_pick_vid"))
        // nanvl: a zero-norm embedding yields NaN cosine, which Spark's
        // ordering treats as LARGEST — unguarded it would poison every
        // subsequent mmr score. Clamping degenerate similarity to 1.0
        // (maximally similar → maximally demoted) is the conservative
        // reading; on well-formed vectors nanvl is a no-op.
        .withColumn(
          "_sim",
          nanvl(VectorOps.cosine(col("embedding"), col("_pick_emb")), lit(1.0)))
        .withColumn(
          "_maxsim",
          when(col("_maxsim").isNull, col("_sim"))
            .otherwise(greatest(col("_maxsim"), col("_sim"))))
        .drop("_pick_vid", "_pick_emb", "_sim")
    }
    selected.select("query_id", "sel_rank", "vec_id", "mmr")
  }
}
