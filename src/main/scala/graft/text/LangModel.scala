package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] Corpus-trained bigram language-model scoring — the
  * CCNet/Gopher-style quality gate ("drop the documents the corpus LM finds
  * surprising"). The reference has no text surface (SURVEY.md §2.B); this
  * sits beside [[TfIdf]]/[[Bm25]] in the curation family. Training and
  * scoring happen in one pass over the same corpus: add-one-smoothed
  * P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V), per-document score is the average
  * negative log-likelihood over its bigrams (low = fluent under the corpus
  * distribution, high = outlier).
  *
  * Shape chosen for 100 TB:
  *   - bigram extraction is ROW-LOCAL (a `transform` over the token array —
  *     no posexplode+window, so no per-doc shuffle just to pair neighbours);
  *   - per-document bigram tf is the first combinable aggregate; the global
  *     bigram table and the w1 context totals both REUSE that aggregate
  *     (re-reduce, never a second tokenize);
  *   - vocabulary size joins back as a broadcast 1-row frame; the bigram
  *     count table joins through a plain equi-join AQE broadcasts while the
  *     model fits and shuffles when it genuinely doesn't;
  *   - scoring is one more combinable per-doc aggregate.
  *
  * Determinism / oracle portability: every count is an exact integer; the
  * one libm step (`ln`) lands in a per-doc double sum whose summation-order
  * wobble (~1e-13 relative) is absorbed by the float32 squeeze + round(4)
  * the emitted score crosses — the same convention as [[Bm25]]/[[TfIdf]].
  */
object LangModel {

  /** Row-local neighbour pairing over `(doc_id, toks)`: `toks[i]` is
    * 0-based SQL subscripting, the transform index runs over the n−1
    * slice, so (x, toks[i+1]) walks every adjacent pair WITHOUT a
    * posexplode+window shuffle. Output `(doc_id, w1, w2)`, one row per
    * bigram occurrence. */
  private def bigramStream(toks: DataFrame): DataFrame =
    toks
      .filter(size(col("toks")) >= 2)
      .select(
        col("doc_id"),
        explode(expr(
          "transform(slice(toks, 1, size(toks) - 1), (x, i) -> struct(x AS w1, toks[i + 1] AS w2))"))
          .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Collocation mining by pointwise mutual information: the corpus's
    * top-`topK` adjacent pairs with `c12 ≥ minCount`, scored
    * PMI = ln(c12·T / (c1·c2)) where c1/c2 marginalize the bigram table
    * and T is the total bigram count — all exact integers into one ln,
    * f32-squeezed on emission. The global cut is `orderBy(...).limit`
    * (a TakeOrdered partial top-k, never a full sort shuffle) over the
    * already count-filtered pair table, with (w1, w2) tie-breaks making
    * the selected SET deterministic at the boundary. */
  def pmiCollocations(docs: DataFrame, minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1 && topK > 0, s"bad minCount=$minCount topK=$topK")
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val c12 = graft.CacheScope.track(
      bigramStream(toks).groupBy("w1", "w2").agg(count(lit(1)).as("c12")).cache())
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val c2 = c12.groupBy("w2").agg(sum(col("c12")).as("c2"))
    val tot = c12.agg(sum(col("c12")).as("t"))

    c12
      .filter(col("c12") >= minCount)
      .join(c1, "w1")
      .join(c2, "w2")
      .crossJoin(broadcast(tot))
      .select(
        col("w1"),
        col("w2"),
        col("c12").cast("long").as("c12"),
        (round(log((col("c12").cast("double") * col("t").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double")))
          .cast("float").cast("double"), 4) + lit(0.0)).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Per-document average bigram negative log-likelihood under the add-one
    * corpus model. Input `docs(doc_id, text)`; output
    * `(doc_id, n_bigrams, avg_nll)` for every document with ≥ 2 tokens
    * (a 0/1-token document has no bigrams and is absent). The vocabulary
    * size V counts distinct tokens over ALL documents, including the short
    * ones the bigram stream excludes. */
  def bigramNll(docs: DataFrame): DataFrame = {
    // Cached: the vocab branch AND the bigram branch both read this
    // projection — uncached, each would re-run the tokenizer over the
    // full corpus (the t07 cross-aggregate re-tokenize trap).
    val toks = graft.CacheScope.track(
      docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks")).cache())

    // V over the full token stream (cheap re-reduce of the same projection).
    val vocab = toks
      .select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("v"))

    val bigrams = bigramStream(toks)

    // Per-doc bigram tf — cached: the global model (c12, c1) re-reduces it,
    // and the scoring join walks it again. CacheScope-tracked so long-lived
    // sessions drop it after the query.
    val docBg = graft.CacheScope.track(
      bigrams.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n")).cache())
    val c12 = docBg.groupBy("w1", "w2").agg(sum(col("n")).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))

    docBg
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(
        col("doc_id"),
        col("n"),
        (col("n").cast("double") *
          log((col("c12").cast("double") + 1.0) /
            (col("c1").cast("double") + col("v").cast("double")))).as("lp"))
      .groupBy("doc_id")
      .agg(
        sum(col("n")).cast("long").as("n_bigrams"),
        // float32-squeeze + round, +0.0 collapsing IEEE -0.0 — the
        // cross-engine-stable projection every oracled float crosses.
        (round((-sum(col("lp")) / sum(col("n")).cast("double"))
          .cast("float").cast("double"), 4) + lit(0.0)).as("avg_nll"))
  }
}
