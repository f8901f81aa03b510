package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension int8) quantization — the 4× compression tier of
  * the compressed-vector family, sitting between raw float32 and
  * [[Pq]]'s 16× product quantization. Each dimension is affinely mapped
  * onto [0, 255] by its corpus min/max and stored as one byte; search is
  * asymmetric (queries stay float32, codes are dequantized inside the
  * distance loop — ADC, the same structure as [[Pq.adcTopK]]).
  *
  * Why this exists at 100 TB: an 8-bit code stream cuts the scan's byte
  * volume 4× with near-lossless recall (the per-element error is bounded
  * by one quantization cell, `scale/255`), so it is the default first
  * stop before PQ's lossier 16×. Train is ONE map-side-partial pass
  * (per-dimension min/max partial-aggregates inside each map partition;
  * the shuffle carries `dim` rows per partition, not the corpus), encode
  * is map-only, and search broadcasts the query batch exactly like the
  * exact scan — nothing here shuffles the corpus.
  *
  * Everything is deterministic double arithmetic (no seeds, no
  * data-dependent iteration), which is what makes the whole pipeline —
  * codes AND distances — reproducible by a SQL oracle from first
  * principles, unlike the k-means-seeded [[Pq]] codebooks.
  *
  * Reference anchor: the reference keeps every vector as raw float64 and
  * scans them exactly (quake_min.py:8-14); compression tiers are
  * engine-added scale paths under the same top-k contract.
  */
object Sq {

  /** Per-dimension affine quantization grid: `mins(i)` + `scales(i)` map
    * dimension i onto code points {0 … 255}. Driver-sized (2·dim doubles). */
  final case class SqModel(dim: Int, mins: Array[Double], scales: Array[Double])

  /** One pass over the corpus: per-dimension min/max. `posexplode` +
    * `groupBy(pos)` partial-aggregates map-side, so the shuffle is `dim`
    * rows per map partition; the driver collect is 2·dim doubles —
    * metadata, not data. Min/max are order-exact, so the model is
    * identical under any partitioning. */
  def train(vectors: DataFrame, embCol: String = "embedding"): SqModel = {
    val st = vectors
      .select(posexplode(col(embCol)).as(Seq("i", "v")))
      .groupBy("i")
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))
      .orderBy("i")
      .collect()
    val mins = st.map(_.getDouble(1))
    val scales = st.indices.map(j => st(j).getDouble(2) - mins(j)).toArray
    SqModel(st.length, mins, scales)
  }

  private def minsCol(m: SqModel): Column = typedlit(m.mins.toSeq)
  private def scalesCol(m: SqModel): Column = typedlit(m.scales.toSeq)

  /** Uncentered code 0..255 as a double column expression for position
    * `i` (0-based). The exact op order — `(v − min) · 255 / scale`, then
    * floor, then clamp — is the portability contract: the DuckDB oracle
    * replays the identical IEEE-double steps, so codes hash-match
    * bit-exactly. A degenerate dimension (scale 0, constant column)
    * quantizes to 0 rather than NaN. */
  private def rawCode(v: Column, mn: Column, sc: Column): Column =
    when(
      sc > 0d,
      least(lit(255.0), greatest(lit(0.0), floor((v.cast("double") - mn) * lit(255.0) / sc))))
      .otherwise(lit(0.0))

  /** Map-only encode to `array<byte>` (codes centered by −128 so they fit
    * the signed byte range; decode adds it back): `(vec_id, code)`. */
  def encode(vectors: DataFrame, model: SqModel, embCol: String = "embedding"): DataFrame = {
    val mc = minsCol(model)
    val sc = scalesCol(model)
    vectors.select(
      col("vec_id"),
      transform(
        sequence(lit(0), lit(model.dim - 1)),
        i =>
          (rawCode(element_at(col(embCol), i + 1), element_at(mc, i + 1), element_at(sc, i + 1))
            - lit(128.0)).cast("byte"))
        .as("code"))
  }

  /** Asymmetric (float query × dequantized code) squared L2: each code
    * point dequantizes to the LOWER EDGE of its cell,
    * `min + code·scale/255` — matching [[rawCode]]'s floor, and again
    * replayable by the oracle in the same op order. Runs inside
    * whole-stage codegen (built-in higher-order functions only). */
  def adcDist(qvec: Column, code: Column, model: SqModel): Column = {
    val mc = minsCol(model)
    val sc = scalesCol(model)
    aggregate(
      transform(
        sequence(lit(0), lit(model.dim - 1)),
        i => {
          val recon = element_at(mc, i + 1) +
            (element_at(code, i + 1).cast("double") + lit(128.0)) * element_at(sc, i + 1) / lit(255.0)
          val d = element_at(qvec, i + 1).cast("double") - recon
          d * d
        }),
      lit(0.0),
      (acc, v) => acc + v)
  }

  /** Per-query top-k over the byte-code table — the code stream is the
    * ONLY corpus-sized input (4× fewer bytes than the float scan); the
    * query batch broadcasts, top-k is the bounded-heap map-side-partial
    * [[TopK]] aggregator. Output `(query_id, rank, vec_id, dist2)`, ties
    * broken by vec_id exactly like the float paths. Pair with
    * [[Pq.rerankExact]] for the standard bounded exact refinement. */
  def adcTopK(codes: DataFrame, model: SqModel, queries: DataFrame, k: Int): DataFrame =
    TopK.perQuery(
      codes
        .crossJoin(broadcast(queries.select(col("query_id"), col("qvec"))))
        .withColumn("dist2", adcDist(col("qvec"), col("code"), model)),
      k)

  /** [[encode]] over an index's vectors table, carrying `partition_id`
    * through so the codes stay joinable against an APS probe set (the
    * same composition [[Pq.encodeWithPartition]] gives the 16× tier). */
  def encodeWithPartition(vectors: DataFrame, model: SqModel, embCol: String = "embedding"): DataFrame = {
    val mc = minsCol(model)
    val sc = scalesCol(model)
    vectors.select(
      col("partition_id").cast("long"),
      col("vec_id").cast("long"),
      transform(
        sequence(lit(0), lit(model.dim - 1)),
        i =>
          (rawCode(element_at(col(embCol), i + 1), element_at(mc, i + 1), element_at(sc, i + 1))
            - lit(128.0)).cast("byte"))
        .as("code"))
  }

  /** IVF + SQ composed: the APS probe set `(query_id, partition_id)`
    * broadcasts against the partitioned code table, so the scan shrinks
    * on BOTH axes — partitions visited (IVF pruning) × bytes per vector
    * (4× int8) — the same shape as the IVFADC composition but with the
    * global grid (no per-partition residuals: the grid is corpus-wide, so
    * probe pruning changes WHICH codes are scanned, never their values —
    * full-probe ≡ the plain [[adcTopK]] scan, spec-pinned). */
  def ivfAdcTopK(
      codes: DataFrame,
      model: SqModel,
      probes: DataFrame,
      queries: DataFrame,
      k: Int): DataFrame = {
    val pq = probes
      .select(col("query_id"), col("partition_id"))
      .join(queries.select(col("query_id"), col("qvec")), Seq("query_id"))
    // The probe set is driver-sized metadata (≤ |Q|·maxProbe pairs), so
    // its distinct partition list is collectible and pushed as a scan
    // filter: over a [[saveCodes]] layout this becomes a PartitionFilters
    // entry — the probed code FILES are read, the rest never leave disk —
    // rather than a full scan discarded at the join. Same discipline as
    // IvfSearch.searchPruned (spec-asserted on the saved artifact).
    val pids = probes.select("partition_id").distinct().collect().map(_.getLong(0)).toSeq
    TopK.perQuery(
      codes
        .filter(col("partition_id").isInCollection(pids))
        .join(broadcast(pq), Seq("partition_id"))
        .withColumn("dist2", adcDist(col("qvec"), col("code"), model)),
      k)
  }

  /** Persist a partition-carrying code table next to its index artifact,
    * partitioned by `partition_id` so probe-pruned searches read only the
    * probed code files — the same layout and co-locate-then-write
    * discipline as [[Pq.saveCodes]]. */
  def saveCodes(codes: DataFrame, path: String): Unit =
    codes
      .select(col("partition_id").cast("long"), col("vec_id").cast("long"), col("code"))
      .repartition(col("partition_id"))
      .write.mode("overwrite")
      .partitionBy("partition_id")
      .parquet(s"$path/sq_codes")

  /** Inverse of [[saveCodes]], bit-identical (Parquet stores the byte
    * arrays verbatim). */
  def loadCodes(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sq_codes")
      .select(col("partition_id").cast("long"), col("vec_id").cast("long"), col("code"))

  /** Persist the grid next to its index artifacts (same discipline as
    * [[Pq.save]]): doubles land at their exact bits in Parquet, so
    * save→load→encode is bit-identical to encoding with the original
    * model. */
  def save(model: SqModel, path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.mins.indices
      .map(i => (i, model.mins(i), model.scales(i)))
      .toDF("i", "mn", "scale")
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$path/sq_grid")
  }

  /** Inverse of [[save]]. */
  def load(path: String, spark: org.apache.spark.sql.SparkSession): SqModel = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/sq_grid").as[(Int, Double, Double)].collect().sortBy(_._1)
    require(rows.nonEmpty, s"no sq grid rows at $path")
    require(rows.map(_._1).toSeq == rows.indices.toSeq, s"non-contiguous grid dims at $path")
    SqModel(rows.length, rows.map(_._2), rows.map(_._3))
  }
}
