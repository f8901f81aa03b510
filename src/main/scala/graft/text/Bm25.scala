package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 scoring of a document corpus against a small fixed query-term
  * set — the retrieval primitive behind corpus curation ("pull the documents
  * about X") and hard-negative mining in a training-data pipeline. The
  * reference has no text-retrieval surface; this is part of the
  * [engine-added] layer (SURVEY.md §2.B).
  *
  * Shape chosen for 100 TB:
  *   - ONE map-side-combinable aggregation over the exploded token stream
  *     computes the document length and every per-term frequency together —
  *     there is no join between a `dl` table and a `tf` table, and the only
  *     shuffle is the per-document partial aggregate.
  *   - The corpus statistics (N, df_t, Σdl) reduce to a SINGLE row, attached
  *     back with a broadcast nested-loop join (1-row build side); the big
  *     side never re-shuffles.
  *
  * Determinism / oracle portability: every input to the score formula is an
  * exact integer (tf, dl, df, N, Σdl) — avgdl is one exact-integer division —
  * so the double-precision score DAG evaluates bit-identically on any
  * IEEE-754 engine that mirrors the operation order; the term sum is a fixed
  * left-to-right fold, and the final float32-squeeze absorbs the one
  * genuinely libm-dependent step (`ln`).
  */
object Bm25 {

  /** Per-document BM25 scores for `terms` over `docs(doc_id, text)`.
    * Output: doc_id, dl, tf0..tf{n-1}, score (raw double — callers round /
    * rank; only documents containing ≥1 query term score > 0, but every
    * tokenized document is returned so callers can also use dl). */
  def score(docs: DataFrame, terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")

    val tok = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))

    // one combinable pass: dl + every per-term tf
    val aggs = count(lit(1)).as("dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("tok") === t, lit(1L)).otherwise(lit(0L))).as(s"tf$i")
      }
    val perDoc = tok.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)

    // corpus stats: one row (N over tokenized docs, Σdl, df per term)
    val statAggs = count(lit(1)).as("n_docs") +: sum(col("dl")).as("total_dl") +:
      terms.indices.map(i => sum(when(col(s"tf$i") > 0, lit(1L)).otherwise(lit(0L))).as(s"df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)

    val scored = perDoc.crossJoin(broadcast(stats))

    val nD = col("n_docs").cast("double")
    val avgdl = col("total_dl").cast("double") / nD // exact-int operands: bit-stable
    val termScores: Seq[Column] = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val df = col(s"df$i").cast("double")
      val idf = log(lit(1.0) + (nD - df + lit(0.5)) / (df + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    val total = termScores.reduceLeft(_ + _) // fixed left-assoc; oracle mirrors

    val outCols = (Seq(col("doc_id"), col("dl")) ++ terms.indices.map(i => col(s"tf$i"))) :+ total.as("score")
    scored.select(outCols: _*)
  }
}
