package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [engine-added] Per-document keyword extraction by smoothed tf·idf — the
  * corpus-curation primitive behind topic filtering ("keep the documents
  * whose top terms hit this vocabulary") and cheap doc tagging in a
  * training-data pipeline. The reference has no text-retrieval surface
  * (SURVEY.md §2.B); this sits beside [[Bm25]] as the query-free sibling.
  *
  * Shape chosen for 100 TB:
  *   - term frequencies are ONE combinable aggregate over the exploded
  *     token stream (shuffle on (doc_id, token));
  *   - document frequencies reduce the tf table again by token — rows
  *     after the first aggregate are (doc, distinct-token), so a plain
  *     count IS the df (no second distinct);
  *   - the corpus size joins back as a broadcast 1-row frame, the df
  *     table through an un-hinted equi-join AQE can broadcast while the
  *     vocabulary fits and shuffle when it genuinely doesn't;
  *   - top-k per document is a window over the (doc_id)-partitioned,
  *     already-small (doc, token, score) stream — never a global sort.
  *
  * Determinism / oracle portability: tf, df, and N are exact integers;
  * idf = ln((N+1)/(df+1)) (add-one smoothing, so a term in every document
  * scores exactly 0 and nothing divides by zero). The one libm-dependent
  * step (`ln`) is absorbed by squeezing the score through float32 BEFORE
  * ranking — ranking on the squeezed value with a token tiebreak keeps
  * the emitted top-k identical on any IEEE-754 engine (same trick as
  * [[Bm25]]'s t08 ranking).
  */
object TfIdf {

  /** Top-`k` terms per document of `docs(doc_id, text)` by tf·idf.
    * Output: `(doc_id, term, tf, score, rnk)`, `rnk` 1-based within the
    * document, ties broken by term; documents with no tokens are absent. */
  def topTerms(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tok = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
    // Cached: df and N both derive from tf — uncached, each branch would
    // re-run the tokenize+explode (the pipeline's CPU) over the corpus.
    // CacheScope-tracked so a long-lived session drops it after the query.
    val tf = graft.CacheScope.track(
      tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).cache())
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("doc_id")).as("n_docs"))

    val scored = tf
      .join(dft, "term")
      .crossJoin(broadcast(n))
      .withColumn(
        "score",
        // float32-squeeze + round, with +0.0 collapsing IEEE -0.0 — the
        // cross-engine-stable projection every oracled float crosses
        round(
          (col("tf").cast("double") *
            log((col("n_docs").cast("double") + 1.0) / (col("df").cast("double") + 1.0)))
            .cast("float").cast("double"),
          4) + lit(0.0))

    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select("doc_id", "term", "tf", "score", "rnk")
  }
}
