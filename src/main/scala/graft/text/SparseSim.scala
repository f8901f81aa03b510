package graft.text

import graft.CacheScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse tf·idf cosine similarity — the lexical near-dup / similar-doc
  * signal that sits between MinHash's set Jaccard ([[Dedup.minhashLsh]])
  * and embedding cosine ([[Dedup.semDedup]]): documents as sparse
  * token-weight vectors under the corpus idf, probe-vs-corpus cosine via
  * an inverted-index join on the shared tokens. The classic sparse
  * similarity join (Bayardo et al., WWW 2007 — the same family as the
  * d03/d07 PPJoin machinery, with weights instead of sets).
  *
  * Incremental framing (the d08 shape): probes are scored against the
  * CORPUS's statistics — tf from the probe, idf from the corpus — so a
  * nightly delta never retrains anything. Scale: the corpus weight table
  * is built once (one tokenize + two re-reductions of the cached tf);
  * probe weights are delta-sized and broadcast into the token join; the
  * dot-product aggregation shuffles only (probe, doc) pairs sharing ≥1
  * token.
  *
  * Weights: w = tf · ln((N+1)/(df+1)) (add-one idf, the [[TfIdf]]
  * convention). Cosine thresholds are compared on the float32-squeezed
  * value on both engines (the t10 discipline) — double sums re-associate
  * across engines, the squeeze collapses the wobble.
  */
object SparseSim {

  /** Corpus statistics from ONE tokenization: term weights
    * `(doc_id, tok, w)`, per-doc norm² `(doc_id, norm2)`, document
    * frequencies `(tok, df)`, and the corpus size N. */
  def corpusStats(docs: DataFrame): (DataFrame, DataFrame, DataFrame, Long) = {
    val tf = CacheScope.track(
      docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("tf"))
        .cache())
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = tf.select("doc_id").distinct().count()
    val w = tf
      .join(df, "tok")
      .select(
        col("doc_id"), col("tok"),
        (col("tf") * log((lit(n.toDouble) + 1.0) / (col("df") + lit(1.0)))).as("w"))
    val norms = w.groupBy("doc_id").agg(sum(col("w") * col("w")).as("norm2"))
    (w, norms, df, n)
  }

  /** Probe-vs-corpus cosine pairs ≥ `minCosine` (compared on the
    * f32-squeezed value). `corpus(doc_id, text)`, `probes(probe_id,
    * text)`; probes are weighted under the corpus idf (tokens unseen in
    * the corpus carry no weight). Output
    * `(probe_id, doc_id, n_shared, cosine)` with raw double cosine. */
  def cosineAgainst(corpus: DataFrame, probes: DataFrame, minCosine: Double): DataFrame = {
    val (cw, cNorms, cDf, n) = corpusStats(corpus)

    val pW = CacheScope.track(
      probes
        .select(col("probe_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("probe_id", "tok")
        .agg(count(lit(1)).as("tf"))
        .join(cDf, Seq("tok")) // corpus idf; unseen tokens carry no weight
        .select(
          col("probe_id"), col("tok"),
          (col("tf") * log((lit(n.toDouble) + 1.0) / (col("df") + lit(1.0)))).as("pw"))
        .cache())
    val pNorms = pW.groupBy("probe_id").agg(sum(col("pw") * col("pw")).as("pnorm2"))

    val dots = cw
      .join(broadcast(pW.select("probe_id", "tok", "pw")), Seq("tok"))
      .groupBy("probe_id", "doc_id")
      .agg(count(lit(1)).as("n_shared"), sum(col("w") * col("pw")).as("dot"))

    dots
      .join(broadcast(pNorms), "probe_id")
      .join(cNorms, "doc_id")
      // zero-norm guard: a side whose every token is corpus-universal has
      // idf 0 everywhere → norm² = 0 → cosine = 0/0 = NaN, and BOTH
      // engines order NaN above every number, so an unguarded NaN would
      // sail over any threshold. A zero-weight document carries no
      // lexical signal — it can't be similar to anything.
      .filter(col("norm2") > 0.0 && col("pnorm2") > 0.0)
      .select(
        col("probe_id"), col("doc_id"), col("n_shared"),
        (col("dot") / sqrt(col("norm2") * col("pnorm2"))).as("cosine"))
      .filter(col("cosine").cast("float").cast("double") >= minCosine)
  }
}
