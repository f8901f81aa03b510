package graft.index

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF lifecycle tests over the sf0.001 embeddings fixture (50 × 64-d) plus
  * small synthetic frames — SURVEY.md §5 suites 1, 3, 4. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = "/root/testdata/sf0.001"
  private lazy val emb: DataFrame =
    spark.read.parquet(s"$fixtures/embeddings.parquet").select("vec_id", "embedding").cache()
  private lazy val model: IvfModel = IvfBuild.build(emb, dim = 64)

  private def queriesOf(ids: Long*): DataFrame =
    emb.filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  test("build: every vector lands in exactly one partition; metadata sizes agree (O7)") {
    val total = model.vectors.count()
    assert(total == emb.count())
    assert(model.totalVectors == total)
    assert(model.partitions.zipWithIndex.forall { case (p, i) => p.pid == i.toLong })
    val actualSizes = model.vectors.groupBy("partition_id").count()
      .as[(Long, Long)].collect().toMap
    model.partitions.foreach(p => assert(actualSizes.getOrElse(p.pid, 0L) == p.size))
  }

  test("APS search achieves recall >= 0.9 at target 0.9 (reference bar, cell-3: 0.968)") {
    val qs = queriesOf(0L to 9L: _*)
    val params = IvfSearch.Params(k = 10, targetRecall = 0.9, maxProbe = 64)
    val res = IvfSearch.search(model, qs, params)
    val exact = IvfSearch.exactTopK(emb, qs, 10)
    val recall = IvfSearch.recallAtK(res, exact, 10, qs)
      .agg(avg("recall")).head.getDouble(0)
    assert(recall >= 0.9, s"mean recall $recall")
  }

  test("chooseProbes returns the minimal probability prefix (O11, quake_min.py:139-145)") {
    val qs = queriesOf(0L, 1L)
    val target = 0.5
    val probes = IvfSearch.chooseProbes(model, qs, IvfSearch.Params(k = 10, targetRecall = target, maxProbe = 64))
      .select("query_id", "p").as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(-_).toVector)
    probes.foreach { case (q, ps) =>
      val total = ps.sum
      // selected mass reaches the target...
      assert(total >= target || ps.nonEmpty, s"q$q sum $total")
      // ...and the prefix is minimal: dropping the last selected goes below
      assert(ps.init.sum < target, s"q$q not minimal")
    }
  }

  test("chooseProbesLocal matches the distributed chooseProbes exactly (parity)") {
    val params = IvfSearch.Params(k = 10, targetRecall = 0.9, maxProbe = 64)
    val qs = queriesOf(0L to 4L: _*)
    val dist = IvfSearch.chooseProbes(model, qs, params)
      .select("query_id", "partition_id").as[(Long, Long)].collect().toSet
    val local = qs.select("query_id", "qvec").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.toArray) }.toSeq
    val loc = IvfSearch.chooseProbesLocal(model, local, params).map(t => (t._1, t._2)).toSet
    assert(loc == dist, s"local-only=${loc -- dist} dist-only=${dist -- loc}")
  }

  test("batched-scan top-k matches the DataFrame paths (exact + probed parity)") {
    val params = IvfSearch.Params(k = 5, targetRecall = 0.9, maxProbe = 64)
    val local = queriesOf(0L to 4L: _*).select("query_id", "qvec").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.toArray) }.toIndexedSeq
    // exact form
    val scanExact = IvfSearch.scanTopKLocal(model.vectors, local, null, 5).toSet
    val dfExact = IvfSearch.exactTopK(emb, queriesOf(0L to 4L: _*), 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(scanExact == dfExact)
    // probed form
    val probes = IvfSearch.chooseProbesLocal(model, local, params)
    val qIdx = local.indices.map(i => local(i)._1 -> i).toMap
    val probing = probes.groupBy(_._2).view.mapValues(_.map(p => qIdx(p._1)).toArray).toMap
    val scanProbed = IvfSearch.scanTopKLocal(model.vectors, local, probing, 5).toSet
    val dfProbed = IvfSearch.search(model, queriesOf(0L to 4L: _*), params.copy(k = 5))
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(scanProbed == dfProbed)
    // driver-mirror form (the replay fast path): bit-identical rows
    val mirror = IvfSearch.collectMirror(model.vectors)
    assert(IvfSearch.scanTopKDriver(mirror.toIndexedSeq, local, null, 5).toSeq ==
      IvfSearch.scanTopKLocal(model.vectors, local, null, 5).toSeq)
    assert(IvfSearch.scanTopKDriver(mirror.toIndexedSeq, local, probing, 5).toSeq ==
      IvfSearch.scanTopKLocal(model.vectors, local, probing, 5).toSeq)
  }

  test("heap top-k aggregator matches the window form bit-for-bit (parity)") {
    val qs = queriesOf(0L to 9L: _*)
    val cands = emb.crossJoin(broadcast(qs))
    val viaWindow = IvfSearch.topkViaWindow(cands, 10)
      .select("query_id", "rank", "vec_id", "dist2")
      .as[(Long, Int, Long, Double)].collect().toSet
    val viaHeap = IvfSearch.exactTopK(emb, qs, 10)
      .select("query_id", "rank", "vec_id", "dist2")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(viaHeap == viaWindow)
  }

  test("search self-query: rank 1 is the query vector itself at distance 0") {
    val res = IvfSearch.search(model, queriesOf(7L), IvfSearch.Params(k = 1, targetRecall = 0.9, maxProbe = 64))
      .collect()
    assert(res.length == 1)
    assert(res(0).getAs[Long]("vec_id") == 7L)
    assert(res(0).getAs[Double]("dist2") == 0.0)
  }

  test("insert then search@k=1 finds the inserted vector (churn property, run_demo.py:71-78)") {
    val novel = Seq.fill(64)(0.9f)
    val adds = Seq((9999L, novel)).toDF("vec_id", "embedding")
    val m2 = IvfMutate.insert(model, adds)
    assert(m2.totalVectors == model.totalVectors + 1)
    assert(m2.partitions.zipWithIndex.forall { case (p, i) => p.pid == i.toLong }, "pid density after insert")
    val q = Seq((0L, novel)).toDF("query_id", "qvec")
    val res = IvfSearch.search(m2, q, IvfSearch.Params(k = 1, targetRecall = 0.95, maxProbe = 64)).collect()
    assert(res.length == 1 && res(0).getAs[Long]("vec_id") == 9999L)
  }

  test("insert rejects wrong-dimension vectors") {
    val adds = Seq((777L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val m2 = IvfMutate.insert(model, adds)
    assert(m2.totalVectors == model.totalVectors)
  }

  test("delete then search never returns the deleted id; unknown ids no-op (O9)") {
    val m2 = IvfMutate.delete(model, Seq(3L, 123456L).toDF("vec_id"))
    assert(m2.totalVectors == model.totalVectors - 1)
    val res = IvfSearch.search(m2, queriesOf(3L), IvfSearch.Params(k = 10, targetRecall = 0.95, maxProbe = 64))
    assert(!res.select("vec_id").as[Long].collect().contains(3L))
  }

  test("split threshold clamps to [split/1.5, split*2] with the reference hotness quirk (O13)") {
    val s = 3000L
    // zero hotness -> raw = split_size
    assert(IvfMaintain.splitThreshold(0L, 0L, 2000.0, s) == 3000.0)
    // huge hotness -> clamped low at split/1.5 = 2000
    assert(IvfMaintain.splitThreshold(1000000L, 0L, 2000.0, s) == 2000.0)
    // negative hotness (hits < last_split_at timestamp quirk) -> max(1, ...) -> split_size
    assert(IvfMaintain.splitThreshold(5L, 4000L, 2000.0, s) == 3000.0)
  }

  test("maintain preserves the vector multiset and id uniqueness") {
    // force both paths: low split size (splits big partitions) and a merge
    val m2 = IvfMaintain.maintain(model, splitSize = 16L, mergeSize = 2L)
    val before = emb.select("vec_id").as[Long].collect().sorted.toSeq
    val after = m2.vectors.select("vec_id").as[Long].collect().sorted.toSeq
    assert(after == before, "vector multiset changed")
    assert(m2.vectors.select("vec_id").distinct().count() == before.length)
    // metadata sizes still agree with the data
    val actualSizes = m2.vectors.groupBy("partition_id").count().as[(Long, Long)].collect().toMap
    m2.partitions.foreach(p => assert(actualSizes.getOrElse(p.pid, 0L) == p.size, s"pid ${p.pid}"))
    assert(m2.partitions.zipWithIndex.forall { case (p, i) => p.pid == i.toLong }, "pid density")
  }

  test("merged-away partitions stay as zero-size husks (quake_min.py:209-210)") {
    // reference fidelity is behind compactHusks = false (engine default compacts)
    val m2 = IvfMaintain.maintain(model, splitSize = 1000000L, mergeSize = 1000000L, compactHusks = false)
    // with mergeSize huge every partition is tiny -> chains absorb; husks remain
    assert(m2.partitions.length == model.partitions.length, "husks must not be compacted away")
    assert(m2.totalVectors == model.totalVectors)
  }

  test("compactHusks drops zero-size partitions, renumbers densely, preserves vectors") {
    val merged = IvfMaintain.maintain(model, splitSize = 1000000L, mergeSize = 1000000L, compactHusks = false)
    assert(merged.partitions.exists(_.size == 0L), "precondition: husks exist")
    val compacted = IvfMaintain.maintain(model, splitSize = 1000000L, mergeSize = 1000000L, compactHusks = true)
    assert(compacted.partitions.forall(_.size > 0L))
    assert(compacted.partitions.zipWithIndex.forall { case (p, i) => p.pid == i.toLong })
    assert(compacted.totalVectors == model.totalVectors)
    assert(compacted.vectors.count() == model.vectors.count())
    // metadata still agrees with the data after the remap
    val sizes = compacted.vectors.groupBy("partition_id").count().as[(Long, Long)].collect().toMap
    compacted.partitions.foreach(p => assert(sizes.getOrElse(p.pid, 0L) == p.size))
  }

  test("recallAtK emits a row for every query, including no-result ones") {
    val qs = Seq((1L, Seq.fill(64)(0f)), (2L, Seq.fill(64)(1f))).toDF("query_id", "qvec")
    val results = Seq((1L, 1, 5L)).toDF("query_id", "rank", "vec_id")
    val exact = Seq((1L, 1, 5L), (1L, 2, 6L)).toDF("query_id", "rank", "vec_id")
    val rec = IvfSearch.recallAtK(results, exact, 10, qs)
      .as[(Long, Double)].collect().toMap
    assert(rec.keySet == Set(1L, 2L))
    assert(rec(1L) == 0.5)
    assert(rec(2L) == 0.0)
  }

  test("distributed build + search path (forced past the local-fit threshold) hits the recall bar") {
    graft.vector.KMeans.localFitThreshold = 0L
    try {
      val m = IvfBuild.build(emb, dim = 64)
      assert(m.totalVectors == emb.count())
      assert(m.partitions.zipWithIndex.forall { case (p, i) => p.pid == i.toLong })
      val qs = queriesOf(0L to 9L: _*)
      val res = IvfSearch.search(m, qs, IvfSearch.Params(k = 10, targetRecall = 0.9, maxProbe = 64))
      val exact = IvfSearch.exactTopK(emb, qs, 10)
      val recall = IvfSearch.recallAtK(res, exact, 10, qs).agg(avg("recall")).head.getDouble(0)
      assert(recall >= 0.9, s"distributed-path recall $recall")
    } finally graft.vector.KMeans.localFitThreshold = graft.vector.KMeans.LocalFitThresholdDefault
  }

  test("checkpoint re-bounds RDD partitions across mutation epochs (quadratic-replay regression)") {
    // Each insert unions a tiny batch (appending its RDD partitions) and
    // each delete stacks an anti-join; without the coalesce inside
    // IvfMutate.checkpoint a long-lived index accumulates sliver partitions
    // and every job pays O(epochs) tasks (measured: 32 -> 832 within 25
    // micro-batches on the sf0.1 replay).
    var m = IvfBuild.build(emb, dim = 64)
    val target = spark.sparkContext.defaultParallelism
    for (epoch <- 0 until 5) {
      val adds = (0 until 4).map(i => (100000L + epoch * 4 + i, Seq.fill(64)(0.5f + 0.01f * i)))
        .toDF("vec_id", "embedding")
      m = IvfMutate.insert(m, adds)
      m = IvfMutate.delete(m, Seq(100000L + epoch * 4).toDF("vec_id"))
      m = IvfMutate.checkpoint(m)
      assert(m.vectors.rdd.getNumPartitions <= target,
        s"epoch $epoch: ${m.vectors.rdd.getNumPartitions} RDD partitions > $target")
    }
    assert(m.totalVectors == emb.count() + 5 * 3)
    assert(m.vectors.count() == m.totalVectors)
  }

  test("model save/load round-trips through partitioned parquet") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfModel.save(spark, model, dir)
    val loaded = IvfModel.load(spark, dir)
    assert(loaded.dim == model.dim)
    assert(loaded.partitions.map(p => (p.pid, p.size)) == model.partitions.map(p => (p.pid, p.size)))
    assert(loaded.vectors.count() == model.vectors.count())
  }

  test("searchPruned on a saved index prunes parquet partitions (PartitionFilters) with identical results") {
    val dir = java.nio.file.Files.createTempDirectory("ivfp").toString
    IvfModel.save(spark, model, dir)
    val loaded = IvfModel.load(spark, dir)
    val params = IvfSearch.Params(k = 10, targetRecall = 0.5, maxProbe = 4)
    val local = queriesOf(0L, 1L).select("query_id", "qvec").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.toArray) }.toSeq
    val pruned = IvfSearch.searchPruned(loaded, local, params)
    // the scan must carry a partition filter on partition_id
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("partition_id"), plan.take(2000))
    // and results must equal the unpruned DataFrame path on the same model
    val viaDf = IvfSearch.search(loaded, queriesOf(0L, 1L), params)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(pruned.as[(Long, Int, Long, Double)].collect().toSet == viaDf)
  }
}
