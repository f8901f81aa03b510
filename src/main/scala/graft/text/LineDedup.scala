package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style line/paragraph-level exact dedup: a line whose normalized
  * text occurs in ≥ `minDocs` DISTINCT documents is boilerplate (headers,
  * footers, nav chrome, cookie banners at web scale) and is removed from
  * every document that carries it, while the rest of each document
  * survives — edit, don't drop (Wenzek et al., CCNet, arXiv:1911.00359 §3;
  * the same signal RefinedWeb applies line-wise).
  *
  * The fixture corpus has no newlines, so "lines" are ALIGNED chunks of
  * `lineTokens` tokens (disjoint, not the sliding grams of
  * [[Dedup.repeatedSpanStats]] — a doc of n tokens yields n/w lines, not
  * n−w+1 grams, and the boilerplate predicate counts DISTINCT carrying
  * docs, which is the CCNet rule). With real newline-delimited text,
  * `split(text, '\n')` slots in for the chunker unchanged.
  *
  * Scale shape: one row-local chunking (no sliding-window blowup), one
  * line-key aggregation (shuffle ∝ corpus lines / w), and the dup-line
  * rejoin — the dup subset is tiny relative to the corpus (that's what
  * makes it boilerplate), so AQE broadcasts it — then one doc-key
  * aggregation to reassemble the kept text. The corpus text itself is
  * shuffled once (to the doc-key reassembly); at 100 TB both aggregations
  * are plain hash-partitioned combines with no skew beyond the hot
  * boilerplate lines themselves, which land on the small side of the join.
  */
object LineDedup {

  /** docs(doc_id, text) → (doc_id, text, n_lines, n_removed) with the
    * boilerplate lines removed and the survivors rejoined in original
    * order. EVERY input doc appears in the output — an empty or
    * whitespace-only doc comes back as ('', 0, 0), never silently
    * dropped (edit, don't drop applies to degenerate inputs too). */
  def dropBoilerplateLines(docs: DataFrame, lineTokens: Int = 8, minDocs: Int = 2): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val w = lineTokens
    // aligned chunk i covers tokens [i*w+1, i*w+w] (1-based slice)
    val lineArr: Column =
      transform(
        sequence(lit(0), floor((size(toks) + lit(w - 1)) / w).cast("int") - 1),
        i => array_join(slice(toks, i * w + 1, lit(w)), " "))
    val lines = docs
      .select(
        col("doc_id"),
        // guard: sequence(0, -1) would step BACKWARD in Spark, so empty
        // docs must short-circuit to an empty line array (posexplode then
        // emits no rows — the doc rejoins through the left join below)
        when(size(toks) > 0, lineArr).otherwise(array().cast("array<string>")).as("lines"))
      .select(col("doc_id"), posexplode(col("lines")).as(Seq("line_idx", "line")))

    val dup = lines
      .groupBy("line")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("line"), lit(true).as("is_dup"))

    val perDoc = lines
      .join(dup, Seq("line"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_removed"),
        // kept lines, reassembled in original order (line_idx is unique
        // per doc, so the struct sort is total)
        array_join(
          transform(
            array_sort(collect_list(when(col("is_dup").isNull, struct(col("line_idx"), col("line"))))),
            x => x.getField("line")),
          " ").as("text"))

    // zero-line docs produced no exploded rows — reinstate them
    docs
      .select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }
}
