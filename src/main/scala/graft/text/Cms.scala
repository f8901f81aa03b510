package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream with cross-engine-portable hash
  * rows — approximate heavy-hitter counting whose summary is O(d·w)
  * regardless of vocabulary size. The classic use at 100 TB: per-partition
  * sketches are plain (row, cell) count tables, so they merge by ADDING
  * CELLS — a map-side-combinable groupBy builds the global sketch with one
  * tiny shuffle, and a streaming job can fold micro-batches into the same
  * structure. Estimates never undercount (each cell only ever adds other
  * tokens' collisions), overcount by ≤ ε·Σcounts with probability 1−δ for
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ (Cormode & Muthukrishnan 2005).
  *
  * Hash rows are Kirsch–Mitzenmacher double hashing over the repo's two
  * independent Karp–Rabin character folds ([[TextOps.tokenHashPortable]] /
  * [[TextOps.tokenHashPortable2]], same multiplicative mixes as
  * [[TextOps.tokenHashPortable60]]): `cell_j = (m1 + j·m2) mod w`. Pure
  * integer arithmetic — the DuckDB oracle rebuilds the identical sketch
  * from first principles (max intermediate m1 + (d−1)·m2 < 2^33, ANSI-safe).
  */
object Cms {

  /** First mixed fold: `(KR_131,1e9+7(tok) · 2654435761) mod 1e9+7`. */
  def mix1(tok: Column): Column =
    pmod(TextOps.tokenHashPortable(tok) * lit(2654435761L), lit(1000000007L))

  /** Second independent mixed fold: `(KR_137,998244353(tok) · 2246822519) mod 998244353`. */
  def mix2(tok: Column): Column =
    pmod(TextOps.tokenHashPortable2(tok) * lit(2246822519L), lit(998244353L))

  /** The d cell indices of a token, as an array column (index j holds row
    * j's cell). Computed from the two folds ONCE per call site — never
    * re-fold the characters per row. */
  def cells(m1: Column, m2: Column, depth: Int, width: Int): Column =
    transform(
      sequence(lit(0), lit(depth - 1)),
      j => pmod(m1 + j.cast("long") * m2, lit(width.toLong)))

  /** Build the d×w sketch from `toks(tokCol)` (one row per token
    * OCCURRENCE): rows `(row_j, cell, cnt)`. Merge two sketches by
    * summing cnt on (row_j, cell). */
  def sketch(toks: DataFrame, tokCol: String, depth: Int, width: Int): DataFrame =
    toks
      .select(posexplode(cells(mix1(col(tokCol)), mix2(col(tokCol)), depth, width)).as(Seq("row_j", "cell")))
      .groupBy("row_j", "cell")
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate each candidate token against a sketch:
    * `est = min_j sketch[j][cell_j(tok)]`. The candidate side is expected
    * tiny (heavy-hitter shortlist) — it explodes ×d and joins the sketch
    * on (row_j, cell); all other candidate columns ride along. */
  def estimate(candidates: DataFrame, tokCol: String, sk: DataFrame, depth: Int, width: Int): DataFrame = {
    val passthrough = candidates.columns.map(col).toSeq
    val probes = candidates
      .select(passthrough :+
        posexplode(cells(mix1(col(tokCol)), mix2(col(tokCol)), depth, width)).as(Seq("row_j", "cell")): _*)
    probes
      .join(broadcast(sk), Seq("row_j", "cell"))
      .groupBy(passthrough: _*)
      .agg(min(col("cnt")).as("est_n"))
  }
}
