package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [engine-added] Johnson–Lindenstrauss random-projection ANN: project the
  * corpus through a seeded ±1 sign matrix (Achlioptas, JCSS 2003 — dense
  * Rademacher variant) from `dIn` to `m` dimensions, scan candidates by
  * L2 in the reduced space, and restore metric fidelity with an exact
  * re-rank. At m = dIn/4 the candidate scan touches a quarter of the
  * float traffic; unlike the quantization tiers ([[Pq]]/[[Sq]]/
  * [[BinaryQuant]]) the reduced vectors stay PLAIN float columns, so the
  * projected table is itself a first-class corpus other operators (k-NN
  * join, radius search, clustering) can run on unchanged — JL is the
  * composable "make the vectors smaller" primitive, not a codec.
  *
  * Determinism / oracle portability: the sign matrix is never
  * materialized — entry (i, j) is a pure function of its coordinates via
  * the same multiplicative-hash-mod-prime family as
  * [[graft.rel.EpochShuffle]] (`sign = 1 − 2·(((i·m + j + 1)·Mult mod P)
  * mod 2)`, every intermediate < 2⁴² so 64-bit exact in any engine), and
  * the projection folds input dimensions in ascending order, so a SQL
  * replay reproduces every projected coordinate BITWISE (multiplying by
  * ±1.0 is exact; only the fixed-order sum carries rounding, identically
  * on both engines). No trained state anywhere — the one ANN family
  * whose accuracy needs no recall bar, because the full pipeline is
  * arithmetic the oracle replays.
  *
  * Scale shape: projection is row-local (map-only, one pass, pushed-down
  * column read of just the vector); the candidate scan broadcasts the
  * projected queries over the projected corpus with the bounded-heap
  * [[TopKAgg]] (≤ cand rows per query per partition ship); the re-rank
  * gathers |queries|·cand full vectors through an equi-join AQE
  * broadcasts. No shuffle touches the corpus until the bounded gather.
  */
object RandomProjection {

  /** Same prime family as EpochShuffle: multiplier mixes, prime keeps the
    * product in 64-bit exact range for every (i, j) this engine meets. */
  private val Mult  = 2654435761L
  private val Prime = 2038074743L

  /** ±1.0 sign of matrix entry (i, j); i, j int columns, m output dims. */
  private def signOf(i: Column, j: Column, m: Int): Column =
    lit(1.0) - lit(2.0) *
      ((((i.cast("long") * m + j.cast("long") + lit(1L)) * lit(Mult)) % lit(Prime)) % lit(2L)).cast("double")

  /** Append `projCol`: array<double> of length `m`, coordinate j =
    * Σ_{i<dIn} vec[i]·sign(i,j) folded in ascending i. */
  def project(df: DataFrame, dIn: Int, m: Int, vecCol: String, projCol: String = "proj"): DataFrame = {
    require(dIn > 0 && m > 0 && m <= dIn, s"bad dims dIn=$dIn m=$m")
    // Bitwise-portability guard: signOf's intermediates stay exact in ANY
    // 64-bit float engine only while (dIn·m + 1)·Mult < 2^53; beyond
    // ~3.39e6 matrix entries a double-arithmetic replayer silently
    // diverges from the long-arithmetic original. Fail loudly instead —
    // a deployment with a bigger dIn·m swaps in a reduced-first mix (and
    // re-pins its oracle) rather than inheriting a reproducibility bug.
    require(
      (dIn.toLong * m + 1) <= (1L << 53) / Mult,
      s"dIn*m=${dIn.toLong * m} exceeds the exact-double bound for signOf (max ${(1L << 53) / Mult - 1})")
    df.withColumn(
      projCol,
      transform(
        sequence(lit(0), lit(m - 1)),
        j =>
          aggregate(
            sequence(lit(0), lit(dIn - 1)),
            lit(0.0),
            (acc, i) => acc + element_at(col(vecCol), i + 1).cast("double") * signOf(i, j, m))))
  }

  /** L2² between two projected array<double> columns, ascending-j fold. */
  private def projL2(a: Column, b: Column, m: Int): Column =
    aggregate(
      sequence(lit(0), lit(m - 1)),
      lit(0.0),
      (acc, j) => {
        val d = element_at(a, j + 1) - element_at(b, j + 1)
        acc + d * d
      })

  /** Probe-pruned JL CANDIDATE scan — IVF × dimensionality reduction,
    * the fourth composition beside IVFADC (v13), IVF+SQ (v16), and
    * IVF+binary (v23): APS probes decide WHICH partitions are scanned,
    * the m-dim projection decides how many floats each scanned row
    * costs. Returns the top-`cand` candidates per query ranked by
    * REDUCED-SPACE L2 (`dist2` is projected distance, not the metric) —
    * callers restore metric fidelity with `Pq.rerankExact` against the
    * float vectors, exactly like [[BinaryQuant.ivfTopK]]'s contract.
    * The sign matrix is corpus-GLOBAL (a pure function of (i, j), no
    * per-partition statistic), so pruning never changes a projected
    * value — full-probe + re-rank ≡ the plain [[topK]] scan,
    * spec-pinned. `proj` is the partition-keyed projected corpus from
    * [[project]] over the index's vectors; `probes(query_id,
    * partition_id)` from APS. */
  def ivfTopK(
      proj: DataFrame,
      probes: DataFrame,
      queries: DataFrame,
      dIn: Int,
      m: Int,
      cand: Int): DataFrame = {
    require(cand > 0, s"bad cand=$cand")
    val qProj = project(
      queries.select(col("query_id"), col("qvec").as("embedding")), dIn, m, "embedding")
      .select(col("query_id"), col("proj").as("qproj"))
    val pq = probes.select("query_id", "partition_id").join(qProj, Seq("query_id"))
    val pids = probes.select("partition_id").distinct().collect().map(_.getLong(0)).toSeq
    TopK.perQuery(
      proj
        .filter(col("partition_id").isInCollection(pids))
        .join(broadcast(pq), Seq("partition_id"))
        .select(
          col("query_id"),
          projL2(col("proj"), col("qproj"), m).as("dist2"),
          col("vec_id")),
      cand)
  }

  /** JL top-`k`: reduced-space candidate scan (top `cand` per query by
    * (projected L2, vec_id)) → exact L2 re-rank. `corpus(vec_id,
    * embedding)`, `queries(query_id, qvec)`; output `(query_id, rank,
    * vec_id, dist2)` with exact double `dist2`. */
  def topK(corpus: DataFrame, queries: DataFrame, dIn: Int, m: Int, k: Int, cand: Int): DataFrame = {
    require(k > 0 && cand >= k, s"bad k=$k cand=$cand")
    val cProj = project(corpus.select("vec_id", "embedding"), dIn, m, "embedding")
      .select(col("vec_id"), col("proj"))
    val qProj = project(
      queries.select(col("query_id"), col("qvec").as("embedding")), dIn, m, "embedding")
      .select(col("query_id"), col("proj").as("qproj"))

    val cands = TopK.perQuery(
      cProj
        .crossJoin(broadcast(qProj))
        .select(
          col("query_id"),
          projL2(col("proj"), col("qproj"), m).as("dist2"),
          col("vec_id")),
      cand)

    TopK.perQuery(
      cands
        .select(col("query_id"), col("vec_id"))
        .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
        .select(
          col("query_id"),
          VectorOps.l2Sq(col("embedding"), col("qvec")).as("dist2"),
          col("vec_id")),
      k)
  }
}
