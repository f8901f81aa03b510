package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained product-quantization model: `codebooks(j)(c)` is codeword `c`
  * of subspace `j`, each of length `dim / m`. With `k ≤ 256` a vector
  * compresses to an `m`-byte `binary` code column — 16× for the fixture's
  * 64-d float32 vectors at m=16 (and that is the MATERIALIZED size: codes
  * are stored as bytes, not boxed ints) — the memory story that lets a
  * 100 TB vector corpus be scanned from RAM instead of disk. */
final case class PqModel(dim: Int, m: Int, k: Int, codebooks: Array[Array[Array[Float]]]) {
  def subLen: Int = dim / m
}

/** [engine-added] Product quantization for vector compression + ADC
  * search (Jégou, Douze & Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — the standard public method; the
  * reference stores full float32 vectors only, quake_min.py:83-85).
  *
  * Split each d-dim vector into `m` slices; per slice, vector-quantize
  * into a `k`-word codebook trained with the SAME deterministic Lloyd's
  * core the IVF build uses ([[KMeans.lloydLocal]] — seeded hash pool,
  * first-minimum assignment), on a bounded hash-priority sample (codebook
  * training is a sample statistic; the standard practice at corpus scale).
  * Search is asymmetric distance computation (ADC): per query ONE exact
  * `m×k` subspace-distance table, then every candidate's approximate d²
  * is `m` table adds over its `m` code bytes — instead of `d` mul-subs
  * over `4d` bytes of float32.
  *
  * Scale shape: train = one bounded `TakeOrderedAndProject` sample +
  * driver Lloyd's on metadata-sized rows; encode = one map-only pass
  * (codebooks broadcast); search = map-side LUT scan + the bounded-heap
  * [[TopK]] aggregator — no shuffle wider than k rows per query per
  * partition, same as the exact scan path.
  */
object Pq {

  /** Density-aware candidate depth for quantized-ordering rerank stages
    * (PQ/ADC, SQ, binary Hamming): a FIXED depth calibrated at one corpus
    * size fails as the corpus densifies, because the exact-distance gap
    * between the k-th and D-th neighbor shrinks with n while quantization
    * error stays constant — measured on the 10× scale-up corpus
    * (n 2,000 → 20,000 random unit vectors, the hardest regime): ADC
    * top-100 rerank recall@10 fell 0.87-0.96 → below 0.8, binary
    * k·64 fell below its 0.9 bar, and restoring the bars needed depth
    * ≈ 10× ([[graft.bench.DepthProbe]] curves: ADC 1000 → 0.955, binary
    * 6400 → 0.980). So the depth scales LINEARLY with corpus size,
    * anchored at the operating point the bars were calibrated at
    * (`base` candidates at `anchor` rows — candidates stay a constant
    * FRACTION of the corpus), floored at `base`, capped at `n`. At
    * 100 TB this composes with IVF probe pruning (the probed subset is
    * the effective corpus) and the rerank cost stays the bounded
    * per-query gather join. Clustered real-world embeddings need far
    * less than the random-vector calibration — the knob stays exposed
    * on every call path. */
  def adaptiveDepth(n: Long, base: Int, anchor: Long = 2000L, maxDepth: Int = 1 << 20): Int = {
    require(base > 0 && anchor > 0, s"bad base=$base anchor=$anchor")
    require(maxDepth >= base, s"maxDepth $maxDepth below base $base")
    // Long arithmetic throughout, capped BEFORE the Int conversion: at
    // n ≈ 4e10 the uncapped scaled depth exceeds Int.MaxValue and a bare
    // .toInt would wrap negative — handed to a top-k operator as k. The
    // cap is also the honest operating bound: a rerank gather deeper than
    // maxDepth per query stops being "bounded per-query work" no matter
    // what the density argument says; callers size it like any budget.
    val scaled = math.max(base.toLong, math.ceil(base.toDouble * n / anchor).toLong)
    math.min(math.min(math.max(n, 1L), scaled), maxDepth.toLong).toInt
  }

  /** [[adaptiveDepth]] with `n` = the MAX per-query probed-candidate
    * count read off an APS probe set (`(query_id, …, psize)` rows —
    * metadata-sized, one tiny aggregate): on a probed scan the candidate
    * ordering only ever ranks the probed subset, so the probed count IS
    * the effective corpus the depth must cover — deriving it from the
    * TOTAL indexed size (as the call sites did before round 15) made
    * per-query rerank work O(total n) even when the probes scanned a
    * sliver, contradicting the sublinear per-query cost the probe path
    * buys. MAX rather than mean because the depth is one global cut: on
    * skewed partitions the hot-cell query's ordering is much deeper than
    * the fleet mean, and a mean-sized cut under-covers exactly that
    * query (round-15 review finding). */
  def adaptiveDepthProbed(
      probes: org.apache.spark.sql.DataFrame,
      base: Int,
      anchor: Long = 2000L,
      maxDepth: Int = 1 << 20): Int = {
    import org.apache.spark.sql.functions._
    val row = probes
      .groupBy("query_id")
      .agg(sum(col("psize")).as("scanned"))
      .agg(max(col("scanned")).as("mx"))
      .head()
    val mx = if (row.isNullAt(0)) 1L else row.getLong(0)
    adaptiveDepth(math.max(mx, 1L), base, anchor, maxDepth)
  }

  /** Nearest codeword of `v[off, off+subLen)` — first-minimum rule,
    * primitive loop, no slice allocation. */
  private def nearestSlice(cb: Array[Array[Float]], v: Array[Float], off: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      val w = cb(c)
      var d = 0.0
      var i = 0
      while (i < w.length) { val t = v(off + i).toDouble - w(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The one encode kernel both entry points share: m code bytes per
    * vector (codes are 0 ≤ c < k ≤ 256, stored two's-complement, read
    * back with `& 0xff`). */
  private def codesFor(mdl: PqModel, v: Array[Float]): Array[Byte] = {
    val subLen = mdl.subLen
    val codes = new Array[Byte](mdl.m)
    var j = 0
    while (j < mdl.m) {
      codes(j) = nearestSlice(mdl.codebooks(j), v, j * subLen).toByte
      j += 1
    }
    codes
  }

  /** Train per-subspace codebooks on a deterministic bounded sample
    * (hash-priority order — same portable-sample idea as the corpus
    * sampling operators, so retrains see the same rows). */
  def train(
      emb: DataFrame,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      seed: Long,
      maxSample: Int = 65536): PqModel = {
    require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
    require(k >= 1 && k <= 256, s"codes are byte-sized: need 1 <= k <= 256, got $k")
    val s = emb.sparkSession
    import s.implicits._
    val sample: Array[(Long, Array[Float])] = emb
      .select(col("vec_id").cast("long"), col("embedding"))
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(maxSample)
      .as[(Long, Array[Float])]
      .collect()
    require(sample.nonEmpty, "cannot train PQ on an empty collection")
    val subLen = dim / m
    val rows: Array[(Long, Long, Array[Float])] = sample.flatMap { case (id, v) =>
      require(v.length == dim, s"vector $id has dim ${v.length}, expected $dim")
      (0 until m).map { j =>
        (j.toLong, id, java.util.Arrays.copyOfRange(v, j * subLen, (j + 1) * subLen))
      }
    }
    val kFor = (0 until m).map(j => j.toLong -> k).toMap
    val (_, cents) = KMeans.lloydLocal(rows, kFor, iters, seed)
    PqModel(dim, m, k, (0 until m).map(j => cents(j.toLong)).toArray)
  }

  /** Map-only encode: `(vec_id long, codes binary)` — m bytes per vector,
    * codebooks broadcast. */
  def encode(emb: DataFrame, model: PqModel): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val b = s.sparkContext.broadcast(model)
    emb
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val mdl = b.value
        it.map { case (id, v) => (id, codesFor(mdl, v)) }
      }
      .toDF("vec_id", "codes")
  }

  /** [[encode]] over an index's vectors table, carrying `partition_id`
    * through so the codes stay joinable against an APS probe set. */
  def encodeWithPartition(vectors: DataFrame, model: PqModel): DataFrame = {
    val s = vectors.sparkSession
    import s.implicits._
    val b = s.sparkContext.broadcast(model)
    vectors
      .select(col("partition_id").cast("long"), col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .mapPartitions { it =>
        val mdl = b.value
        it.map { case (pid, id, v) => (pid, id, codesFor(mdl, v)) }
      }
      .toDF("partition_id", "vec_id", "codes")
  }

  /** `v − c`, the residual a vector keeps after its partition centroid is
    * subtracted (IVFADC, Jégou et al. 2011 §IV-A: residuals concentrate
    * near 0 so a small codebook covers them far better than raw points —
    * the standard public fix for PQ's weak recall on spread-out data). */
  private def residual(v: Array[Float], c: Array[Float]): Array[Float] = {
    val r = new Array[Float](v.length)
    var i = 0
    while (i < v.length) { r(i) = v(i) - c(i); i += 1 }
    r
  }

  /** [[train]] over RESIDUALS `x − centroid(partition_id)` — the IVFADC
    * codebook (Jégou et al. 2011). `centroids` is the index's
    * partition-centroid metadata ([[graft.index.IvfModel.partitions]]) —
    * driver-sized by construction, a few MB at 100 TB scale. The sample is
    * the same deterministic hash-priority bound as [[train]]. */
  def trainResiduals(
      vectors: DataFrame,
      centroids: Map[Long, Array[Float]],
      dim: Int,
      m: Int,
      k: Int,
      iters: Int,
      seed: Long,
      maxSample: Int = 65536): PqModel = {
    require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
    require(k >= 1 && k <= 256, s"codes are byte-sized: need 1 <= k <= 256, got $k")
    val s = vectors.sparkSession
    import s.implicits._
    val sample: Array[(Long, Long, Array[Float])] = vectors
      .select(col("partition_id").cast("long"), col("vec_id").cast("long"), col("embedding"))
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(maxSample)
      .as[(Long, Long, Array[Float])]
      .collect()
    require(sample.nonEmpty, "cannot train PQ on an empty collection")
    val subLen = dim / m
    val rows: Array[(Long, Long, Array[Float])] = sample.flatMap { case (pid, id, v) =>
      require(v.length == dim, s"vector $id has dim ${v.length}, expected $dim")
      val r = residual(v, centroids(pid))
      (0 until m).map { j =>
        (j.toLong, id, java.util.Arrays.copyOfRange(r, j * subLen, (j + 1) * subLen))
      }
    }
    val kFor = (0 until m).map(j => j.toLong -> k).toMap
    val (_, cents) = KMeans.lloydLocal(rows, kFor, iters, seed)
    PqModel(dim, m, k, (0 until m).map(j => cents(j.toLong)).toArray)
  }

  /** [[encodeWithPartition]] of RESIDUALS: codes quantize
    * `x − centroid(partition_id)` against a [[trainResiduals]] codebook.
    * Still map-only — the centroid table rides the same broadcast as the
    * codebooks. */
  def encodeResiduals(
      vectors: DataFrame,
      model: PqModel,
      centroids: Map[Long, Array[Float]]): DataFrame = {
    val s = vectors.sparkSession
    import s.implicits._
    val b = s.sparkContext.broadcast((model, centroids))
    vectors
      .select(col("partition_id").cast("long"), col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .mapPartitions { it =>
        val (mdl, cents) = b.value
        it.map { case (pid, id, v) => (pid, id, codesFor(mdl, residual(v, cents(pid)))) }
      }
      .toDF("partition_id", "vec_id", "codes")
  }

  /** One exact m×k subspace-distance table for query `qv`, flat-indexed
    * `j * model.k + c`. */
  private def lutFor(mdl: PqModel, qv: Array[Float]): Array[Double] = {
    val subLen = mdl.subLen
    val stride = mdl.k
    val lut = new Array[Double](mdl.m * stride)
    var j = 0
    while (j < mdl.m) {
      val cb = mdl.codebooks(j)
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var d = 0.0
        var i = 0
        while (i < w.length) { val t = qv(j * subLen + i).toDouble - w(i); d += t * t; i += 1 }
        lut(j * stride + c) = d
        c += 1
      }
      j += 1
    }
    lut
  }

  /** ADC top-k over an encoded collection for a bounded query batch
    * `(query_id, qvec)` (collected + broadcast, like every search entry
    * point). Output `(query_id, rank, vec_id, dist2)` where `dist2` is the
    * ADC approximation of squared L2. */
  def adcTopK(codes: DataFrame, model: PqModel, queries: DataFrame, k: Int): DataFrame = {
    val s = codes.sparkSession
    import s.implicits._
    val q: Array[(Long, Array[Float])] = queries
      .select(col("query_id").cast("long"), col("qvec"))
      .as[(Long, Array[Float])]
      .collect()
    val bm = s.sparkContext.broadcast(model)
    val bq = s.sparkContext.broadcast(q)
    val cands = codes
      .select(col("vec_id").cast("long"), col("codes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val mdl = bm.value
        val qs = bq.value
        val stride = mdl.k
        // every query scans every row here, so all tables are built up
        // front, once per partition — each candidate then costs m adds
        // per query
        val luts: Array[Array[Double]] = qs.map(q => lutFor(mdl, q._2))
        it.flatMap { case (id, arr) =>
          qs.indices.iterator.map { qi =>
            val lut = luts(qi)
            var d = 0.0
            var j = 0
            while (j < arr.length) { d += lut(j * stride + (arr(j) & 0xff)); j += 1 }
            (qs(qi)._1, d, id)
          }
        }
      }
      .toDF("query_id", "dist2", "vec_id")
    TopK.perQuery(cands, k)
  }

  /** IVF + PQ — the composed 100 TB flagship: the APS probe set prunes the
    * scan to the partitions worth reading, and ADC makes what remains a
    * lookup-table pass over byte codes instead of float vectors. `codes`
    * must carry `(partition_id, vec_id, codes)` (encode the index's
    * vectors table once, keeping its `partition_id`); `probes` is the
    * `(query_id, partition_id)` probe set from `IvfSearch.chooseProbes` —
    * broadcast, so the codes table is joined in place, never shuffled
    * (the same plan shape as the float gather join, audited in
    * PlanAuditSpec for that path). Each candidate row computes ONLY its
    * probing queries' distances, and each task builds tables ONLY for the
    * queries that actually probe its rows (lazy memo — with Q queries and
    * P partitions, eager tables would cost O(Q·m·k) in every task and
    * erode the very pruning this operator exists for) — total work is
    * O(scanned codes · probing queries), mirroring quake_min.py:151-163
    * in the compressed domain. */
  def ivfAdcTopK(
      codes: DataFrame,
      model: PqModel,
      probes: DataFrame,
      queries: DataFrame,
      k: Int): DataFrame = {
    val s = codes.sparkSession
    import s.implicits._
    val q: Array[(Long, Array[Float])] = queries
      .select(col("query_id").cast("long"), col("qvec"))
      .as[(Long, Array[Float])]
      .collect()
    val bm = s.sparkContext.broadcast(model)
    val bq = s.sparkContext.broadcast(q)
    val cands = codes
      .join(broadcast(probes.select(col("query_id").cast("long"), col("partition_id"))), Seq("partition_id"))
      .select(col("query_id"), col("vec_id").cast("long"), col("codes"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { it =>
        val mdl = bm.value
        val stride = mdl.k
        lazy val qvById: Map[Long, Array[Float]] = bq.value.toMap
        val luts = new scala.collection.mutable.LongMap[Array[Double]]()
        it.map { case (qid, vid, arr) =>
          val lut = luts.getOrElseUpdate(qid, lutFor(mdl, qvById(qid)))
          var d = 0.0
          var j = 0
          while (j < arr.length) { d += lut(j * stride + (arr(j) & 0xff)); j += 1 }
          (qid, d, vid)
        }
      }
      .toDF("query_id", "dist2", "vec_id")
    TopK.perQuery(cands, k)
  }

  /** [[ivfAdcTopK]] over RESIDUAL codes — full IVFADC (Jégou et al. 2011
    * §IV-A): a candidate in partition `p` is scored as
    * `Σ_j lut_{q,p}(j, code_j)` where the lookup table is built from the
    * query's OWN residual against that partition, `q − centroid(p)`. The
    * memo is therefore keyed per (query, partition) — still lazy, still
    * bounded by the probe set (≤ |probes| tables per task, each m×k
    * doubles), so the pruning economics of [[ivfAdcTopK]] are unchanged;
    * only the key is finer. */
  def ivfAdcResidualTopK(
      codes: DataFrame,
      model: PqModel,
      centroids: Map[Long, Array[Float]],
      probes: DataFrame,
      queries: DataFrame,
      k: Int): DataFrame = {
    val s = codes.sparkSession
    import s.implicits._
    val q: Array[(Long, Array[Float])] = queries
      .select(col("query_id").cast("long"), col("qvec"))
      .as[(Long, Array[Float])]
      .collect()
    val b = s.sparkContext.broadcast((model, centroids, q))
    val cands = codes
      .join(broadcast(probes.select(col("query_id").cast("long"), col("partition_id").cast("long"))), Seq("partition_id"))
      .select(col("query_id"), col("partition_id"), col("vec_id").cast("long"), col("codes"))
      .as[(Long, Long, Long, Array[Byte])]
      .mapPartitions { it =>
        val (mdl, cents, qs) = b.value
        val stride = mdl.k
        lazy val qvById: Map[Long, Array[Float]] = qs.toMap
        val luts = new scala.collection.mutable.HashMap[(Long, Long), Array[Double]]()
        it.map { case (qid, pid, vid, arr) =>
          val lut = luts.getOrElseUpdate((qid, pid), lutFor(mdl, residual(qvById(qid), cents(pid))))
          var d = 0.0
          var j = 0
          while (j < arr.length) { d += lut(j * stride + (arr(j) & 0xff)); j += 1 }
          (qid, d, vid)
        }
      }
      .toDF("query_id", "dist2", "vec_id")
    TopK.perQuery(cands, k)
  }

  /** Persist a trained codebook as a small Parquet table — the PQ analog
    * of [[graft.index.IvfModel.save]]: one row per (subspace, codeword),
    * so the artifact is engine-portable (DuckDB/Spark/anything reading
    * Parquet) and metadata-sized (m·k rows). Codes tables are ordinary
    * DataFrames the caller writes like any other table (partition by
    * `partition_id` for probe-pruned reads, as [[graft.index.IvfModel.save]]
    * does for vectors); only the model needs this dedicated shape. */
  def save(model: PqModel, path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val rows = for {
      j <- 0 until model.m
      c <- model.codebooks(j).indices
    } yield (j, c, model.codebooks(j)(c).toSeq)
    rows.toDF("subspace", "codeword", "center")
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$path/codebooks")
    Seq((model.dim, model.m, model.k))
      .toDF("dim", "m", "k")
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$path/meta")
  }

  /** Persist an encoded codes table `(partition_id, vec_id, codes)` next
    * to its index artifact, partitioned by `partition_id` — the layout
    * [[save]]'s doc promises, and the same co-locate-then-write discipline
    * as [[graft.index.IvfModel.save]] (repartition on the partition column
    * first, or every task writes a sliver into every directory — the
    * classic small-files problem). Encoding is a full corpus pass; a saved
    * codes table makes it once-per-build instead of once-per-query-batch,
    * and partition-dir layout means a probe-pruned search reads ONLY the
    * probed partitions' code files. */
  def saveCodes(codes: DataFrame, path: String): Unit =
    codes
      .select(col("partition_id").cast("long"), col("vec_id").cast("long"), col("codes"))
      .repartition(col("partition_id"))
      .write.mode("overwrite")
      .partitionBy("partition_id")
      .parquet(s"$path/codes")

  /** Inverse of [[saveCodes]]: the codes table back, bit-identical
    * (Parquet stores the byte arrays verbatim; the partition column is
    * re-cast to long because partition-dir inference reads it as int). */
  def loadCodes(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codes")
      .select(col("partition_id").cast("long"), col("vec_id").cast("long"), col("codes"))

  /** Inverse of [[save]]: rebuild the [[PqModel]] from its Parquet
    * artifact. Codewords land at their exact float bits (Parquet stores
    * the floats verbatim), so save→load→encode is bit-identical to
    * encoding with the original model. A subspace may legitimately hold
    * fewer than `k` codewords (training pools smaller than k keep what
    * they have) — lengths are taken from the table, only contiguity of
    * codeword indices is enforced. */
  def load(path: String, spark: org.apache.spark.sql.SparkSession): PqModel = {
    import spark.implicits._
    val (dim, m, k) = spark.read.parquet(s"$path/meta").as[(Int, Int, Int)].head()
    val bySub = spark.read.parquet(s"$path/codebooks")
      .as[(Int, Int, Array[Float])]
      .collect()
      .groupBy(_._1)
    val cb: Array[Array[Array[Float]]] = (0 until m).toArray.map { j =>
      val rows = bySub.getOrElse(j, Array.empty).sortBy(_._2)
      require(rows.nonEmpty, s"codebook table at $path has no rows for subspace $j")
      require(
        rows.map(_._2).toSeq == rows.indices.toSeq,
        s"codebook table at $path has non-contiguous codeword ids in subspace $j")
      rows.map(_._3)
    }
    PqModel(dim, m, k, cb)
  }

  /** Exact re-rank of an ADC candidate list — the second standard IVFADC
    * refinement: ADC distances ORDER candidates well but are quantized, so
    * take the ADC top-N (N a few × k), gather those N float vectors, and
    * re-score exactly. Output distances are then TRUE squared L2, and
    * recall@k becomes recall@N of the ADC stage (strictly easier).
    *
    * Plan shape = the v08 bounded gather join: the (query, candidate,
    * qvec) set is |Q|·N rows — driver-bounded like every probe set — and
    * is broadcast, so the float vectors table is scanned in place, never
    * shuffled. The exact kernel is the codegen'd [[L2Squared]]. */
  def rerankExact(cands: DataFrame, vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val pairs = cands.select(col("query_id").cast("long"), col("vec_id").cast("long"))
    val q = queries.select(col("query_id").cast("long"), col("qvec"))
    val scored = vectors
      .select(col("vec_id").cast("long"), col("embedding"))
      .join(broadcast(pairs.join(q, Seq("query_id"))), Seq("vec_id"))
      .withColumn("dist2", VectorOps.l2Sq(col("qvec"), col("embedding")))
    TopK.perQuery(scored, k)
  }
}
