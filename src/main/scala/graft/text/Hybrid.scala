package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] Hybrid retrieval fusion: combine a keyword-ranked list
  * (BM25, [[Bm25]]) and a vector-ranked list (cosine k-NN,
  * [[graft.index.KnnJoin]]) into one ranking via Reciprocal Rank Fusion
  * (Cormack, Clarke & Büttcher, SIGIR 2009):
  *
  *   rrf(d) = Σ_lists 1 / (k0 + rank_list(d)),   absent list ⇒ 0.
  *
  * RRF is the standard fusion in hybrid search engines (Elasticsearch,
  * Vespa, Weaviate all ship it) because it needs no score calibration —
  * only ranks — so a BM25 log-scale score and a bounded cosine fuse
  * without normalization constants.
  *
  * Scale shape: the inputs are already top-N lists (N rows per query,
  * not corpus-sized), so the fusion join is metadata-sized — a
  * full-outer join on (doc_id) of two N-row lists followed by one
  * ordered cut. Spark cannot broadcast a full-outer join, so this is a
  * shuffle — of 2N list rows, not the corpus. The heavy lifting (corpus
  * scan, inverted scoring, ANN probe) happened upstream in the list
  * producers; fusion itself is free at any corpus size.
  *
  * Determinism: ranks are exact integers and 1/(k0+rank) is one IEEE
  * division each, summed in a fixed two-term order — bit-reproducible
  * across engines, so the fused ordering is oracle-replayable.
  *
  * @param keyword top-N keyword list, columns (`doc_id`, `rank`)
  * @param vector  top-N vector list, columns (`doc_id`, `rank`)
  * @param k0      RRF smoothing constant (60 in the paper and in every
  *                production default)
  * @return (`doc_id`, `kw_rank`, `vec_rank`, `rrf`) — `kw_rank` /
  *         `vec_rank` null when the doc is absent from that list
  */
object Hybrid {

  def rrf(keyword: DataFrame, vector: DataFrame, k0: Int = 60): DataFrame = {
    val kw = keyword.select(col("doc_id"), col("rank").cast("int").as("kw_rank"))
    val vec = vector.select(col("doc_id"), col("rank").cast("int").as("vec_rank"))
    kw.join(vec, Seq("doc_id"), "full_outer")
      .withColumn(
        "rrf",
        coalesce(lit(1.0) / (lit(k0.toDouble) + col("kw_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0.toDouble) + col("vec_rank")), lit(0.0)))
  }
}
