package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge

/** [engine-added] Binary (sign-bit) quantization — the 32×-compression end
  * of the ANN menu beside PQ (16×, [[Pq]]) and int8 SQ (4×, [[Sq]]): each
  * dimension collapses to one bit (coordinate > 0, exact for the
  * zero-centered corpus this engine targets), packed 32 bits per code
  * word. Candidate generation is a Hamming-distance scan over the packed
  * codes (the codegen'd [[HammingDist]] kernel — `Long.bitCount(xor)` per
  * word, 2 longs per 64-d vector vs 64 floats raw), and an exact L2
  * re-rank of the bounded candidate set restores metric fidelity.
  *
  * Shape chosen for 100 TB: query codes broadcast over the corpus code
  * scan (the only full pass touches 1/32 of the raw bytes); per-query
  * candidate selection is the bounded-heap [[TopKAgg]] (ships ≤ k' rows
  * per query per map partition, never a global sort); the exact re-rank
  * gathers only |queries|·k' embedding rows through an equi-join AQE
  * broadcasts at any realistic query-batch size.
  *
  * Determinism / oracle portability: codes pack 32 bits per word
  * (`array<long>` holding values < 2³²) so a SQL replay never touches the
  * BIGINT sign bit; bit = coordinate > 0 compares raw float32 fixture
  * values — no trained statistic, nothing engine-dependent. Hamming and
  * the candidate cut are exact integers; tie-breaks are (distance,
  * vec_id) everywhere.
  */
object BinaryQuant {

  /** Code words per vector: 32 bits packed per long. */
  def numWords(dim: Int): Int = (dim + 31) / 32

  /** Append packed sign-bit codes: bit j of word w is set iff
    * `vecCol[32·w + j] > 0`. Row-local HOF — encode runs once per corpus,
    * off the scan hot path. */
  def encode(df: DataFrame, dim: Int, vecCol: String = "embedding", codeCol: String = "code"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val words = (0 until numWords(dim)).map { w =>
      val lo = w * 32
      val hi = math.min(dim, lo + 32) - 1
      s"aggregate(sequence($lo, $hi), CAST(0 AS BIGINT), (acc, j) -> acc | " +
        s"IF(element_at($vecCol, j + 1) > CAST(0 AS FLOAT), " +
        s"shiftleft(CAST(1 AS BIGINT), CAST(j - $lo AS INT)), CAST(0 AS BIGINT)))"
    }
    df.withColumn(codeCol, expr(s"array(${words.mkString(", ")})"))
  }

  /** Hamming distance between two packed-code columns (codegen'd kernel). */
  def hamming(a: Column, b: Column): Column =
    GraftSqlBridge.column(HammingDist(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Packed codes keyed by their vectors' IVF partition — the
    * composable artifact for probe-pruned binary search ([[ivfTopK]]).
    * Because the sign-bit code is corpus-global (no per-partition
    * statistic, like [[Sq]]'s grid and unlike [[Pq]]'s residuals),
    * pruning never changes a code's value — full-probe search is
    * bit-identical to the plain [[topK]] scan (spec-pinned). */
  def encodeWithPartition(vectors: DataFrame, dim: Int): DataFrame =
    encode(vectors, dim).select(col("vec_id"), col("partition_id"), col("code"))

  /** Persist the partition-carrying code table partitioned by
    * `partition_id`, so probed searches read ONLY the probed code files —
    * the same layout contract as `Sq.saveCodes`/`Pq.saveCodes`. */
  def saveCodes(codes: DataFrame, path: String): Unit =
    codes
      .repartition(col("partition_id"))
      .write.mode("overwrite").partitionBy("partition_id")
      .parquet(s"$path/bq_codes")

  def loadCodes(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/bq_codes")
      .select(col("vec_id").cast("long"), col("partition_id").cast("long"), col("code"))

  /** Probe-pruned Hamming candidate scan: codes of the probed IVF
    * partitions only (`probes(query_id, partition_id)` from APS), top
    * k·`rerank` per query — callers restore metric fidelity with
    * `Pq.rerankExact`. The probed partition list is driver-sized
    * metadata pushed as a scan filter, so a [[saveCodes]] layout reads
    * only the probed files (the `Sq.ivfAdcTopK` discipline). */
  def ivfTopK(
      codes: DataFrame,
      probes: DataFrame,
      queries: DataFrame,
      dim: Int,
      k: Int,
      rerank: Int = 4): DataFrame = {
    val qCodes = encode(queries.select(col("query_id"), col("qvec").as("embedding")), dim)
      .select(col("query_id"), col("code").as("qcode"))
    val pq = probes
      .select(col("query_id"), col("partition_id"))
      .join(qCodes, Seq("query_id"))
    val pids = probes.select("partition_id").distinct().collect().map(_.getLong(0)).toSeq
    TopK.perQuery(
      codes
        .filter(col("partition_id").isInCollection(pids))
        .join(broadcast(pq), Seq("partition_id"))
        .select(
          col("query_id"),
          hamming(col("code"), col("qcode")).cast("double").as("dist2"),
          col("vec_id")),
      k * rerank)
  }

  /** Binary-quantized top-`k`: Hamming scan → top-(k·`rerank`) candidates
    * per query → exact L2 re-rank. `corpus(vec_id, embedding)`,
    * `queries(query_id, qvec)`; output `(query_id, rank, vec_id, dist2)`
    * with exact double `dist2` and (dist2, vec_id) tie-breaks. */
  def topK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int, rerank: Int = 4): DataFrame = {
    require(k > 0 && rerank >= 1, s"bad k=$k rerank=$rerank")
    val cCodes = encode(corpus.select("vec_id", "embedding"), dim)
      .select(col("vec_id"), col("code"))
    val qCodes = encode(queries.select(col("query_id"), col("qvec").as("embedding")), dim)
      .select(col("query_id"), col("code").as("qcode"))

    // One corpus-code scan per query batch; hamming is the codegen kernel.
    val cands = TopK.perQuery(
      cCodes
        .crossJoin(broadcast(qCodes))
        .select(
          col("query_id"),
          hamming(col("code"), col("qcode")).cast("double").as("dist2"),
          col("vec_id")),
      k * rerank)

    // Bounded gather: |queries|·k·rerank rows meet the corpus equi-join
    // (AQE broadcasts the candidate side), then exact distances re-rank.
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
