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

  /** IVF-accelerated approximate k-NN join over a prebuilt index. */
  def ivf(model: IvfModel, queries: DataFrame, k: Int, targetRecall: Double = 0.9, maxProbe: Int = 64): DataFrame =
    IvfSearch.search(model, normalizeQueries(queries), IvfSearch.Params(k, targetRecall, maxProbe))

  /** Accept either `(query_id, qvec)` or `(vec_id, embedding)` shapes. */
  private def normalizeQueries(queries: DataFrame): DataFrame =
    if (queries.columns.contains("query_id")) queries.select("query_id", "qvec")
    else queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
}
