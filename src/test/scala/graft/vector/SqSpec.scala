package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SqSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, dim: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { id =>
      // deterministic pseudo-random floats in [-1, 1), exact binary
      // fractions (k/1024) so double arithmetic stays reproducible
      (id.toLong, (0 until dim).map { j =>
        val h = (id * 1315423911L + j * 2654435761L) & 0x3ff
        (h - 512).toFloat / 1024.0f
      })
    }

  test("train grid is the exact per-dimension min/max; encode stays in byte range") {
    val emb = fixture(200, 16).toDF("vec_id", "embedding")
    val model = Sq.train(emb)
    assert(model.dim == 16)
    val rows = fixture(200, 16).map(_._2)
    for (j <- 0 until 16) {
      val col = rows.map(_(j).toDouble)
      assert(model.mins(j) == col.min)
      assert(model.scales(j) == col.max - col.min)
    }
    val codes = Sq.encode(emb, model).as[(Long, Seq[Byte])].collect()
    assert(codes.length == 200)
    assert(codes.forall(_._2.length == 16))
  }

  test("dequantized reconstruction is within one quantization cell everywhere") {
    val data = fixture(200, 16)
    val emb = data.toDF("vec_id", "embedding")
    val model = Sq.train(emb)
    val codes = Sq.encode(emb, model).as[(Long, Seq[Byte])].collect().toMap
    for ((id, v) <- data; j <- 0 until 16) {
      val cell = model.scales(j) / 255.0
      val recon = model.mins(j) + (codes(id)(j) + 128.0) * model.scales(j) / 255.0
      // lower-edge dequantization: recon ≤ v < recon + cell (up to fp dust)
      assert(v(j) - recon >= -1e-12, s"id=$id j=$j")
      assert(v(j) - recon <= cell + 1e-12, s"id=$id j=$j")
    }
  }

  test("a constant dimension quantizes to code 0 with finite distances") {
    val emb = (0L until 50L).map(id => (id, Seq(1.5f, id.toFloat / 64))).toDF("vec_id", "embedding")
    val model = Sq.train(emb)
    assert(model.scales(0) == 0.0)
    val codes = Sq.encode(emb, model).as[(Long, Seq[Byte])].collect()
    assert(codes.forall(_._2(0) == -128)) // raw code 0, centered by −128
    val qs = Seq((0L, Seq(1.5f, 0.1f))).toDF("query_id", "qvec")
    val top = Sq.adcTopK(Sq.encode(emb, model), model, qs, k = 5)
      .as[(Long, Int, Long, Double)].collect()
    assert(top.length == 5)
    assert(top.forall(r => !r._4.isNaN && !r._4.isInfinite))
  }

  test("ADC top-10 tracks the exact scan: recall ≥ 0.95 and re-rank restores 1.0") {
    val data = fixture(400, 24)
    val emb = data.toDF("vec_id", "embedding")
    val model = Sq.train(emb)
    val codes = Sq.encode(emb, model)
    val qs = data.take(10).map { case (id, v) => (id, v) }.toDF("query_id", "qvec")

    val exact = graft.index.IvfSearch.exactTopK(emb, qs, k = 10)
    val adc = Sq.adcTopK(codes, model, qs, k = 10)
    def recall(res: org.apache.spark.sql.DataFrame): Double =
      graft.index.IvfSearch
        .recallAtK(res, exact, 10, qs)
        .agg(avg("recall")).as[Double].head()

    // 8-bit cells are tiny relative to the spread: near-lossless recall
    assert(recall(adc) >= 0.95, s"adc recall ${recall(adc)}")

    // the standard bounded refinement: exact re-rank of the ADC top-30
    val reranked = Pq.rerankExact(Sq.adcTopK(codes, model, qs, k = 30), emb, qs, k = 10)
    assert(recall(reranked) == 1.0)
  }

  test("grid save -> load is exact; saved-code search equals fresh-encode search") {
    val data = fixture(300, 16)
    val emb = data.toDF("vec_id", "embedding")
    val model = Sq.train(emb)
    val dir = java.nio.file.Files.createTempDirectory("sq_spec_").toString
    Sq.save(model, dir, spark)
    val loaded = Sq.load(dir, spark)
    assert(loaded.dim == model.dim)
    assert(loaded.mins.toSeq == model.mins.toSeq) // exact double bits
    assert(loaded.scales.toSeq == model.scales.toSeq)

    // partition-carrying codes round-trip bit-identically through Parquet
    val vecs = emb.withColumn("partition_id", pmod(col("vec_id"), lit(4L)))
    Sq.saveCodes(Sq.encodeWithPartition(vecs, model), dir)
    val fresh = Sq.encodeWithPartition(vecs, loaded)
      .as[(Long, Long, Seq[Byte])].collect().map(r => (r._2, r._3)).toMap
    val saved = Sq.loadCodes(spark, dir)
      .as[(Long, Long, Seq[Byte])].collect().map(r => (r._2, r._3)).toMap
    assert(saved == fresh)

    // probe-pruned search over the saved layout pushes the probe set into
    // the scan's PartitionFilters — probed files are read, the rest never
    // leave disk
    val qs = data.take(3).map { case (id, v) => (id, v) }.toDF("query_id", "qvec")
    val probes = qs.select("query_id").crossJoin(Seq(0L, 1L).toDF("partition_id"))
    val pruned = Sq.ivfAdcTopK(Sq.loadCodes(spark, dir), model, probes, qs, k = 5)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(
      "PartitionFilters: \\[[^\\]]*partition_id".r.findFirstIn(scan).isDefined,
      s"no partition pruning in saved-code scan:\n${scan.take(2000)}")
  }

  test("IVF+SQ: full-probe scan is identical to the plain ADC scan; pruned recall holds") {
    val data = fixture(400, 24)
    val emb = data.toDF("vec_id", "embedding")
    val model = Sq.train(emb)
    // synthetic 4-way partitioning: probe pruning must only SUBSET rows,
    // never change a code or a distance (the grid is corpus-global)
    val vecs = emb.withColumn("partition_id", pmod(col("vec_id"), lit(4L)))
    val codes = Sq.encodeWithPartition(vecs, model)
    val qs = data.take(10).map { case (id, v) => (id, v) }.toDF("query_id", "qvec")

    val allProbes = qs.select("query_id")
      .crossJoin(Seq(0L, 1L, 2L, 3L).toDF("partition_id"))
    val fullProbe = Sq.ivfAdcTopK(codes, model, allProbes, qs, k = 10)
      .as[(Long, Int, Long, Double)].collect().toSet
    val plain = Sq.adcTopK(codes.drop("partition_id"), model, qs, k = 10)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(fullProbe == plain)

    // pruning to 2 of 4 partitions keeps every reachable true neighbor:
    // recall against exact-restricted-to-those-partitions is 1 after re-rank
    val twoProbes = qs.select("query_id")
      .crossJoin(Seq(0L, 1L).toDF("partition_id"))
    val pruned = Pq.rerankExact(
      Sq.ivfAdcTopK(codes, model, twoProbes, qs, k = 30), emb, qs, k = 10)
    val exactRestricted = graft.index.IvfSearch.exactTopK(
      vecs.filter(col("partition_id") < 2L).select("vec_id", "embedding"), qs, k = 10)
    val rec = graft.index.IvfSearch
      .recallAtK(pruned, exactRestricted, 10, qs)
      .agg(avg("recall")).as[Double].head()
    assert(rec == 1.0, s"pruned recall $rec")
  }
}
