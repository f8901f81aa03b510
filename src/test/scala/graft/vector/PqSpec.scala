package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("encode + ADC are EXACT when vectors are codeword concatenations") {
    // dim=8, m=4 subspaces of 2; three known codewords per subspace — no
    // training involved, so this isolates the encode/LUT/scan plumbing
    val cb: Array[Array[Array[Float]]] = Array.tabulate(4, 3) { (j, c) =>
      Array((j + 1).toFloat * (c + 1), -(c + 1).toFloat)
    }
    val model = PqModel(dim = 8, m = 4, k = 3, codebooks = cb)
    def build(codes: Seq[Int]): Seq[Float] =
      codes.zipWithIndex.flatMap { case (c, j) => cb(j)(c).toSeq }
    val plan = Seq(
      1L -> Seq(0, 1, 2, 0),
      2L -> Seq(2, 2, 2, 2),
      3L -> Seq(1, 0, 1, 0))
    val emb = plan.map { case (id, cs) => (id, build(cs)) }.toDF("vec_id", "embedding")

    val encoded = Pq.encode(emb, model)
    // the compression claim is about the MATERIALIZED type: m raw bytes
    assert(encoded.schema("codes").dataType == org.apache.spark.sql.types.BinaryType)
    val codes = encoded.as[(Long, Array[Byte])].collect().toMap
    assert(plan.forall { case (id, cs) => codes(id).map(_ & 0xff).toSeq == cs })

    // an off-codebook query: ADC distance must equal the true squared L2
    // because every vector sits exactly on its codewords
    val qv = (1 to 8).map(i => 0.1f * i + 0.3f)
    val queries = Seq((100L, qv)).toDF("query_id", "qvec")
    val got = Pq
      .adcTopK(Pq.encode(emb, model), model, queries, k = 3)
      .select("rank", "vec_id", "dist2")
      .as[(Int, Long, Double)]
      .collect()
      .toSeq
      .sortBy(_._1)
    def l2(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val want = plan
      .map { case (id, cs) => (id, l2(build(cs), qv)) }
      .sortBy(t => (t._2, t._1))
      .zipWithIndex
      .map { case ((id, d), i) => (i + 1, id, d) }
    assert(got.map(_._2) == want.map(_._2))
    got.zip(want).foreach { case ((_, _, gd), (_, _, wd)) => assert(math.abs(gd - wd) < 1e-9) }
  }

  test("train is deterministic; guards reject bad dims and oversized k") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    def flat(m: PqModel): Seq[Float] = m.codebooks.flatten.flatten.toSeq
    val a = Pq.train(emb, dim = 64, m = 8, k = 4, iters = 4, seed = 7L)
    val b = Pq.train(emb, dim = 64, m = 8, k = 4, iters = 4, seed = 7L)
    assert(flat(a) == flat(b))
    intercept[IllegalArgumentException](Pq.train(emb, dim = 64, m = 7, k = 4, iters = 1, seed = 1L))
    intercept[IllegalArgumentException](Pq.train(emb, dim = 64, m = 8, k = 300, iters = 1, seed = 1L))
  }

  test("ivfAdcTopK with a full probe set equals plain ADC; a pruned probe set prunes") {
    val cb: Array[Array[Array[Float]]] = Array.tabulate(4, 3) { (j, c) =>
      Array((j + 1).toFloat * (c + 1), -(c + 1).toFloat)
    }
    val model = PqModel(dim = 8, m = 4, k = 3, codebooks = cb)
    def build(codes: Seq[Int]): Seq[Float] =
      codes.zipWithIndex.flatMap { case (c, j) => cb(j)(c).toSeq }
    val emb = Seq(
      (1L, build(Seq(0, 1, 2, 0))),
      (2L, build(Seq(2, 2, 2, 2))),
      (3L, build(Seq(1, 0, 1, 0)))).toDF("vec_id", "embedding")
    // vectors 1,2 live in partition 100; vector 3 in partition 200
    val vectors = emb.withColumn("partition_id", when(col("vec_id") < 3, 100L).otherwise(200L))
    val codes = Pq.encodeWithPartition(vectors, model)
    val qv = (1 to 8).map(i => 0.2f * i)
    val queries = Seq((50L, qv)).toDF("query_id", "qvec")

    val fullProbes = Seq((50L, 100L), (50L, 200L)).toDF("query_id", "partition_id")
    val full = Pq.ivfAdcTopK(codes, model, fullProbes, queries, k = 3)
      .select("rank", "vec_id", "dist2").as[(Int, Long, Double)].collect().toSeq
    val plain = Pq.adcTopK(Pq.encode(emb, model), model, queries, k = 3)
      .select("rank", "vec_id", "dist2").as[(Int, Long, Double)].collect().toSeq
    assert(full.sortBy(_._1) == plain.sortBy(_._1))

    val pruned = Pq.ivfAdcTopK(codes, model, Seq((50L, 200L)).toDF("query_id", "partition_id"), queries, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(pruned == Seq(3L)) // only the probed partition's vector is scanned
  }

  test("composed IVF+PQ on the fixture: APS probes + ADC clear a recall floor") {
    // end-to-end integration of the raw-code v13 building block: real IVF
    // build, real probe choice, compressed scan — regression net for the
    // composition (the fixture is unit-random, the hardest PQ regime;
    // measured ~0.48)
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val ivf = graft.index.IvfBuild.build(emb, 64)
    val pq = Pq.train(emb, dim = 64, m = 16, k = 16, iters = 10, seed = 7L)
    val codes = Pq.encodeWithPartition(ivf.vectors, pq)
    val qs = emb.filter(col("vec_id") < 15).select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val probes = graft.index.IvfSearch.chooseProbes(ivf, qs, graft.index.IvfSearch.Params(k = 10))
    val approx = Pq.ivfAdcTopK(codes, pq, probes.select("query_id", "partition_id"), qs, k = 10)
    val exact = graft.index.KnnJoin.exact(qs, emb, 10)
    val recall = graft.index.IvfSearch
      .recallAtK(approx, exact, 10, qs)
      .agg(avg("recall"))
      .head()
      .getDouble(0)
    assert(recall >= 0.35, s"composed IVF+PQ recall@10 = $recall")
  }

  test("full IVFADC (residual codes + exact re-rank) lifts composed recall to >= 0.8") {
    // the v13 shipped path: residual-trained codebooks, per-(query,
    // partition) LUTs, ADC top-100 re-ranked exactly — the two standard
    // Jégou et al. 2011 refinements over the raw-code test above
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val ivf = graft.index.IvfBuild.build(emb, 64)
    val cents = ivf.partitions.map(p => p.pid -> p.centroid).toMap
    val pq = Pq.trainResiduals(ivf.vectors, cents, 64, m = 16, k = 16, iters = 10, seed = 7L)
    val codes = Pq.encodeResiduals(ivf.vectors, pq, cents)
    val qs = emb.filter(col("vec_id") < 15).select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val probes = graft.index.IvfSearch.chooseProbes(ivf, qs, graft.index.IvfSearch.Params(k = 10))
    val adc = Pq.ivfAdcResidualTopK(codes, pq, cents, probes.select("query_id", "partition_id"), qs, k = 100)
    val approx = Pq.rerankExact(adc, emb, qs, k = 10)
    val exact = graft.index.KnnJoin.exact(qs, emb, 10)
    val recall = graft.index.IvfSearch
      .recallAtK(approx, exact, 10, qs)
      .agg(avg("recall"))
      .head()
      .getDouble(0)
    assert(recall >= 0.8, s"IVFADC residual+rerank recall@10 = $recall")
  }

  test("saveCodes/loadCodes round-trips bit-for-bit; saved-codes search equals fresh encode") {
    // the "encode once, reuse across query batches" contract: a codes
    // table written partitioned-by-partition_id and read back must be the
    // same multiset of (partition_id, vec_id, code bytes), and IVFADC over
    // the loaded table must reproduce the fresh-encode search exactly —
    // this is the artifact v13/v14 serve their codes from
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val ivf = graft.index.IvfBuild.build(emb, 64)
    val cents = ivf.partitions.map(p => p.pid -> p.centroid).toMap
    val pq = Pq.trainResiduals(ivf.vectors, cents, 64, m = 16, k = 16, iters = 10, seed = 7L)
    val fresh = Pq.encodeResiduals(ivf.vectors, pq, cents)
    val tmp = java.nio.file.Files.createTempDirectory("pq_codes_rt_")
    try {
      Pq.saveCodes(fresh, tmp.toString)
      val loaded = Pq.loadCodes(spark, tmp.toString)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .as[(Long, Long, Array[Byte])].collect()
        .map { case (p, v, c) => (p, v, c.toSeq) }.sortBy(t => (t._1, t._2)).toSeq
      assert(rows(loaded) == rows(fresh))
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val probes = graft.index.IvfSearch
        .chooseProbes(ivf, qs, graft.index.IvfSearch.Params(k = 10))
        .select("query_id", "partition_id")
      def search(codes: org.apache.spark.sql.DataFrame) =
        Pq.ivfAdcResidualTopK(codes, pq, cents, probes, qs, k = 10)
          .select("query_id", "rank", "vec_id", "dist2")
          .as[(Long, Int, Long, Double)].collect().sortBy(t => (t._1, t._2)).toSeq
      assert(search(loaded) == search(fresh))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("residual ADC is EXACT when vectors sit on centroid + codeword; rerank returns true L2") {
    // partition centroids c_p plus codeword-concatenation residuals: the
    // residual path's analog of the raw exactness test — every vector is
    // exactly c_pid + concat(codewords), so per-(query,partition) LUT sums
    // must equal the true squared L2 bit-for-bit
    // every constant is an exact binary fraction so the float adds and
    // subtracts below round nothing — the test can then demand 1e-9
    val cb: Array[Array[Array[Float]]] = Array.tabulate(4, 3) { (j, c) =>
      Array((j + 1).toFloat * (c + 1) * 0.25f, -(c + 1).toFloat * 0.25f)
    }
    val model = PqModel(dim = 8, m = 4, k = 3, codebooks = cb)
    val cents = Map(100L -> Array.fill(8)(4.0f), 200L -> Array.fill(8)(-2.0f))
    def build(pid: Long, codes: Seq[Int]): Seq[Float] =
      codes.zipWithIndex.flatMap { case (c, j) => cb(j)(c).toSeq }
        .zip(cents(pid).toSeq).map { case (r, cc) => r + cc }
    val plan = Seq(
      (1L, 100L, Seq(0, 1, 2, 0)),
      (2L, 100L, Seq(2, 2, 2, 2)),
      (3L, 200L, Seq(1, 0, 1, 0)))
    val vectors = plan
      .map { case (id, pid, cs) => (id, build(pid, cs), pid) }
      .toDF("vec_id", "embedding", "partition_id")

    val codes = Pq.encodeResiduals(vectors, model, cents)
    val got = codes.as[(Long, Long, Array[Byte])].collect().map(t => t._2 -> t._3.map(_ & 0xff).toSeq).toMap
    assert(plan.forall { case (id, _, cs) => got(id) == cs })

    val qv = (1 to 8).map(i => 0.5f * i - 1.0f)
    val queries = Seq((50L, qv)).toDF("query_id", "qvec")
    val probes = Seq((50L, 100L), (50L, 200L)).toDF("query_id", "partition_id")
    val adc = Pq.ivfAdcResidualTopK(codes, model, cents, probes, queries, k = 3)
      .select("vec_id", "dist2").as[(Long, Double)].collect().toMap
    def l2(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    plan.foreach { case (id, pid, cs) =>
      assert(math.abs(adc(id) - l2(build(pid, cs), qv)) < 1e-9, s"vec $id")
    }

    // re-rank over the same candidates must return the identical exact
    // distances (here ADC is already exact) and the identical order
    val rer = Pq.rerankExact(
      Pq.ivfAdcResidualTopK(codes, model, cents, probes, queries, k = 3),
      vectors.select("vec_id", "embedding"), queries, k = 3)
      .select("vec_id", "dist2").as[(Long, Double)].collect().toMap
    plan.foreach { case (id, _, _) => assert(math.abs(rer(id) - adc(id)) < 1e-9) }
  }

  test("trainResiduals is deterministic and guarded like train") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val ivf = graft.index.IvfBuild.build(emb, 64)
    val cents = ivf.partitions.map(p => p.pid -> p.centroid).toMap
    def flat(m: PqModel): Seq[Float] = m.codebooks.flatten.flatten.toSeq
    val a = Pq.trainResiduals(ivf.vectors, cents, 64, m = 8, k = 4, iters = 4, seed = 7L)
    val b = Pq.trainResiduals(ivf.vectors, cents, 64, m = 8, k = 4, iters = 4, seed = 7L)
    assert(flat(a) == flat(b))
    intercept[IllegalArgumentException](Pq.trainResiduals(ivf.vectors, cents, 64, m = 7, k = 4, iters = 1, seed = 1L))
    intercept[IllegalArgumentException](Pq.trainResiduals(ivf.vectors, cents, 64, m = 8, k = 300, iters = 1, seed = 1L))
  }

  test("load rejects a codebook table with missing or non-contiguous codeword rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pq_load_guard_").toString
    try {
      Seq((2, 2, 2)).toDF("dim", "m", "k").write.mode("overwrite").parquet(s"$tmp/meta")
      // subspace 1 absent entirely
      Seq((0, 0, Seq(1.0f)), (0, 1, Seq(2.0f)))
        .toDF("subspace", "codeword", "center")
        .write.mode("overwrite").parquet(s"$tmp/codebooks")
      intercept[IllegalArgumentException](Pq.load(tmp, spark))
      // subspace 1 present but codeword ids skip 0
      Seq((0, 0, Seq(1.0f)), (1, 1, Seq(2.0f)))
        .toDF("subspace", "codeword", "center")
        .write.mode("overwrite").parquet(s"$tmp/codebooks")
      intercept[IllegalArgumentException](Pq.load(tmp, spark))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("save/load round-trips the codebooks bit-for-bit; codes agree") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val model = Pq.train(emb, dim = 64, m = 8, k = 4, iters = 4, seed = 7L)
    val tmp = java.nio.file.Files.createTempDirectory("pq_save_").toString
    try {
      Pq.save(model, tmp, spark)
      val loaded = Pq.load(tmp, spark)
      assert(loaded.dim == model.dim && loaded.m == model.m && loaded.k == model.k)
      assert( // exact float bits, not approximate equality
        loaded.codebooks.flatten.flatten.toSeq == model.codebooks.flatten.flatten.toSeq)
      val a = Pq.encode(emb, model).as[(Long, Array[Byte])].collect().map(t => t._1 -> t._2.toSeq).toMap
      val b = Pq.encode(emb, loaded).as[(Long, Array[Byte])].collect().map(t => t._1 -> t._2.toSeq).toMap
      assert(a == b)
    } finally {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("ADC recall on clustered data clears the bar (compression keeps the neighborhood)") {
    // 20 tight Gaussian-ish clusters in 16-d: the regime PQ is built for.
    // Deterministic pseudo-random points from hashed ids.
    def h(x: Long): Double = {
      val z = x * 2654435761L % 1000003L
      (z.toDouble / 1000003.0) - 0.5
    }
    val pts = (0L until 400L).map { i =>
      val cl = (i % 20L).toInt
      val v = (0 until 16).map { d =>
        val center = 10.0 * h(cl * 31L + d)
        (center + 0.05 * h(i * 131L + d * 7L)).toFloat
      }
      (i, v)
    }
    val emb = pts.toDF("vec_id", "embedding").repartition(4)
    val model = Pq.train(emb, dim = 16, m = 4, k = 32, iters = 8, seed = 11L)
    val codes = Pq.encode(emb, model)
    val qs = pts.take(25).map { case (id, v) => (id, v) }.toDF("query_id", "qvec")
    val approx = Pq.adcTopK(codes, model, qs, k = 10)
    val exact = graft.index.KnnJoin.exact(qs, emb, 10)
    val recall = graft.index.IvfSearch
      .recallAtK(approx, exact, 10, qs)
      .agg(avg("recall"))
      .head()
      .getDouble(0)
    assert(recall >= 0.8, s"PQ recall@10 on clustered data = $recall")
  }

  test("rerankExact over the exact top-N reproduces the exact top-k (identity floor)") {
    // re-rank is a pure re-scoring: feeding it the true top-25 candidate
    // set must reproduce the exact top-10 row-for-row, distances and all
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val top25 = graft.index.KnnJoin.exact(qs, emb, 25)
    val rr = Pq.rerankExact(top25, emb, qs, 10)
      .select("query_id", "rank", "vec_id", "dist2").as[(Long, Int, Long, Double)].collect().toSet
    val want = graft.index.KnnJoin.exact(qs, emb, 10)
      .select("query_id", "rank", "vec_id", "dist2").as[(Long, Int, Long, Double)].collect().toSet
    assert(rr == want)
  }

  test("adaptiveDepth: floored at base up to the anchor, linear past it, capped at n") {
    // at or below the calibration anchor the depth IS the calibrated
    // base — the 1× operating point is byte-identical
    assert(Pq.adaptiveDepth(500, 100) == 100)
    assert(Pq.adaptiveDepth(2000, 100) == 100)
    // linear in n past the anchor: candidates stay a constant fraction
    assert(Pq.adaptiveDepth(20000, 100) == 1000)
    assert(Pq.adaptiveDepth(20000, 64) == 640)
    assert(Pq.adaptiveDepth(3000, 100) == 150)
    // never deeper than the corpus itself
    assert(Pq.adaptiveDepth(50, 100) == 50)
    assert(Pq.adaptiveDepth(1, 100) == 1)
  }
}
