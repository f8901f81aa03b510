package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select("vec_id", "embedding").cache()

  test("exact knn join: self-join rank 1 is the row itself; ivf agrees with exact on top-1") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = KnnJoin.exact(queries, emb, k = 3)
    val self = exact.filter(col("rank") === 1).select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(self.forall { case (q, v) => q == v })

    val model = IvfBuild.build(emb, 64)
    val ivf = KnnJoin.ivf(model, queries, k = 3, targetRecall = 0.95)
    val ivfTop = ivf.filter(col("rank") === 1).select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    self.foreach { case (q, _) => assert(ivfTop(q) == q, s"ivf top-1 for $q") }
  }

  test("radius search: exact membership is the brute-force rule; ivf variant is a high-recall subset") {
    val queries = emb.filter(col("vec_id") < 5)
    val r2 = 1.9
    val exact = KnnJoin.radiusExact(queries, emb, r2)
    // membership check against a hand-rolled distance on a sample query
    val got = exact.filter(col("query_id") === 0).select("vec_id").as[Long].collect().toSet
    val q0 = emb.filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    val all = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val want = all.filter { case (_, e) =>
      e.zip(q0).map { case (a, b) => (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum <= r2
    }.map(_._1).toSet
    assert(got == want, s"exact radius membership: ${got.size} vs ${want.size}")
    assert(exact.filter(col("dist2") > r2).isEmpty)

    val model = IvfBuild.build(emb, 64)
    val ivf = KnnJoin.radiusIvf(model, queries, r2, targetRecall = 0.95)
    val exactPairs = exact.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivfPairs = ivf.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivfPairs.subsetOf(exactPairs), "pruned scan can only shrink the neighborhood")
    val recall = ivfPairs.size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"ivf radius recall $recall below bar")
  }

  test("lsh knn join: planted near-identical neighbors surface at rank 1") {
    // queries = perturbed copies of corpus vectors (cos ≈ 0.999 with their
    // source): the LSH buckets must recover the source as the top cosine
    // neighbor for (nearly) every query — identical sketch bits with high
    // probability at this perturbation.
    val queries = emb.filter(col("vec_id") < 20).select(
      col("vec_id").as("query_id"),
      transform(
        col("embedding"),
        (x, i) => x + when(pmod(i, lit(2)) === 0, lit(0.003f)).otherwise(lit(-0.003f))).as("qvec"))
    val res = KnnJoin.lsh(queries, emb, dim = 64, k = 3)
    val top1 = res.filter(col("rank") === 1).select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(top1.length >= 18, s"only ${top1.length}/20 queries produced candidates")
    val hits = top1.count { case (q, v) => q == v }
    assert(hits >= 18, s"only $hits/20 planted neighbors found at rank 1")
    // cosine ordering: ranks strictly descending in cos per query
    val perQ = res.select("query_id", "rank", "cos").as[(Long, Int, Double)].collect().groupBy(_._1)
    perQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh knn join recall@10 vs exact clears the v11 bar (32 planes, 8 bands)") {
    // the v11 driver query's config, pinned here deterministically (the
    // hyperplanes are hash-derived): natural corpus-member queries, so the
    // top-10 neighbors sit at moderate cosine — the hard case for LSH
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val lsh = KnnJoin.lsh(queries, emb, dim = 64, k = 10, nPlanes = 32, bands = 8)
    val exact = KnnJoin.exact(queries, emb, k = 10)
    val recall = IvfSearch.recallAtK(lsh, exact, 10, queries)
      .agg(avg("recall")).head.getDouble(0)
    assert(recall >= 0.5, s"lsh recall@10 = $recall")
  }

  test("pq knn join backend clears the IVFADC recall bar and returns true L2 distances") {
    // the v14 driver query's pq row, pinned deterministically: IVFADC
    // residual codes + exact re-rank behind the shared KnnJoin contract
    val model = IvfBuild.build(emb, 64)
    val cents = model.partitions.map(p => p.pid -> p.centroid).toMap
    val pqm = graft.vector.Pq.trainResiduals(model.vectors, cents, 64, m = 16, k = 16, iters = 10, seed = 7L)
    val codes = graft.vector.Pq.encodeResiduals(model.vectors, pqm, cents)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val res = KnnJoin.pq(model, pqm, codes, queries, k = 10)
    val exact = KnnJoin.exact(queries, emb, k = 10)
    val recall = IvfSearch.recallAtK(res, exact, 10, queries)
      .agg(avg("recall")).head.getDouble(0)
    assert(recall >= 0.7, s"pq knn recall@10 = $recall")

    // re-ranked distances are exact: wherever pq and exact agree on a
    // (query, vec) pair, the reported dist2 must match to double noise
    val got = res.select("query_id", "vec_id", "dist2").as[(Long, Long, Double)].collect()
      .map { case (q, v, d) => (q, v) -> d }.toMap
    val want = exact.select("query_id", "vec_id", "dist2").as[(Long, Long, Double)].collect()
      .map { case (q, v, d) => (q, v) -> d }.toMap
    val common = got.keySet intersect want.keySet
    assert(common.nonEmpty)
    common.foreach(kk => assert(math.abs(got(kk) - want(kk)) < 1e-9, s"dist mismatch at $kk"))
  }

  test("sq knn join backend: near-lossless recall and true L2 distances after re-rank") {
    // the v14 driver query's sq row: int8 ADC scan + exact re-rank of the
    // top-30 behind the shared contract — 8-bit cells are tiny relative
    // to the corpus spread, so recall should be ≈1, well above pq's bar
    val sqm = graft.vector.Sq.train(emb)
    val codes = graft.vector.Sq.encode(emb, sqm)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val res = KnnJoin.sq(sqm, codes, queries, emb, k = 10)
    val exact = KnnJoin.exact(queries, emb, k = 10)
    val recall = IvfSearch.recallAtK(res, exact, 10, queries)
      .agg(avg("recall")).head.getDouble(0)
    assert(recall >= 0.95, s"sq knn recall@10 = $recall")

    val got = res.select("query_id", "vec_id", "dist2").as[(Long, Long, Double)].collect()
      .map { case (q, v, d) => (q, v) -> d }.toMap
    val want = exact.select("query_id", "vec_id", "dist2").as[(Long, Long, Double)].collect()
      .map { case (q, v, d) => (q, v) -> d }.toMap
    val common = got.keySet intersect want.keySet
    assert(common.nonEmpty)
    common.foreach(kk => assert(math.abs(got(kk) - want(kk)) < 1e-9, s"dist mismatch at $kk"))
  }

  test("filtered knn: exact leaks no out-of-predicate ids and equals exact on the pre-filtered corpus; ivf variant clears the recall bar") {
    val embL = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pred = col("label") % 3 === 0
    val queries = embL.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val ex = KnnJoin.exactFiltered(queries, embL, pred, k = 10)

    val keepIds = embL.filter(pred).select("vec_id").as[Long].collect().toSet
    val returned = ex.select("vec_id").as[Long].collect()
    assert(returned.nonEmpty && returned.forall(keepIds), "exactFiltered leaked an out-of-predicate id")

    // filtered search ≡ plain search over the pre-filtered corpus
    val ref = KnnJoin.exact(queries, embL.filter(pred).select("vec_id", "embedding"), k = 10)
    val got = ex.select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    val want = ref.select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect().toSet
    assert(got == want, "exactFiltered diverged from exact-on-filtered-corpus")

    // IVF variant: probe-pruned scan restricted to the keep set — never
    // leaks, and recall@10 vs the filtered exact answer clears the bar
    val model = IvfBuild.build(embL.select("vec_id", "embedding"), 64)
    val keep = embL.filter(pred).select("vec_id")
    val ivf = KnnJoin.ivfFiltered(model, queries, keep, k = 10, targetRecall = 0.95)
    val ivfIds = ivf.select("vec_id").as[Long].collect()
    assert(ivfIds.nonEmpty && ivfIds.forall(keepIds), "ivfFiltered leaked an out-of-predicate id")
    val recall = IvfSearch.recallAtK(ivf, ex, 10, queries)
      .agg(avg("recall")).head.getDouble(0)
    assert(recall >= 0.9, s"ivfFiltered recall@10 = $recall below bar")
  }

  test("knn graph: exactly k out-edges per node, no self-edges, ranks follow distance; ivf graph clears the recall bar") {
    val k = 4
    val g = KnnJoin.knnGraph(emb, k).cache()
    val deg = g.groupBy("src").agg(
      count(lit(1)).as("d"),
      sum(when(col("src") === col("dst"), 1L).otherwise(0L)).as("selfs"))
    assert(deg.filter(col("d") =!= k || col("selfs") =!= 0L).isEmpty, "outdegree/self-edge violation")
    assert(deg.count() == emb.count(), "every node must emit edges")
    // rank order must be non-decreasing in distance within each node
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src").orderBy("rnk")
    val disordered = g
      .withColumn("pd", lag("dist2", 1).over(w))
      .filter(col("pd").isNotNull && col("pd") > col("dist2"))
    assert(disordered.isEmpty, "rank order disagrees with distance order")

    val model = IvfBuild.build(emb, 64)
    val approx = KnnJoin.knnGraph(emb, k, Some(model))
    val exactE = g.select("src", "dst").as[(Long, Long)].collect().toSet
    val gotE = approx.select("src", "dst").as[(Long, Long)].collect().toSet
    val recallG = (exactE & gotE).size.toDouble / exactE.size
    assert(recallG >= 0.9, s"ivf knn-graph edge recall $recallG below bar")
    g.unpersist()
  }

  test("nn-descent round: refined graph keeps the contract shape and per-node exact-graph recall never drops") {
    val k = 4
    val exact = KnnJoin.knnGraph(emb, k).cache()
    val model = IvfBuild.build(emb, 64)
    val seed = KnnJoin.knnGraph(emb, k, Some(model)).cache()
    val refined = KnnJoin.nnDescentRound(seed, emb, k).cache()
    // contract shape: <= k rank-bounded out-edges, no self edges, rank
    // order follows distance
    val deg = refined.groupBy("src").agg(
      count(lit(1)).as("d"),
      max("rnk").as("mr"),
      sum(when(col("src") === col("dst"), 1L).otherwise(0L)).as("selfs"))
    assert(deg.filter(col("d") > k || col("mr") > k || col("selfs") =!= 0L).isEmpty,
      "refined graph violates the out-degree/self-edge contract")
    // refinement re-ranks a SUPERSET of the seed edges, so per-node
    // edge recall vs the exact graph is monotonically non-decreasing
    def edges(g: org.apache.spark.sql.DataFrame) =
      g.select("src", "dst").as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val exactE = edges(exact)
    val seedE = edges(seed)
    val refE = edges(refined)
    exactE.foreach { case (srcId, want) =>
      val before = (seedE.getOrElse(srcId, Set.empty) & want).size
      val after = (refE.getOrElse(srcId, Set.empty) & want).size
      assert(after >= before, s"node $srcId recall dropped after refinement: $before -> $after")
    }
    // and the plan never degenerates to an all-pairs product
    val plan = refined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"nn-descent candidate generation fell back to a cartesian product:\n$plan")
    Seq(exact, seed, refined).foreach(_.unpersist())
  }

  test("degree prefix: rnk<=k view of a higher-degree probed build equals the direct k build") {
    // the canonical-degree sharing contract (PipelineQueries.knnGraphFor
    // builds once at degree 16 and serves smaller degrees as rnk views):
    // valid because probe choice ignores k, the top-K heap's prefix is
    // the top-k heap, and the closure semi-join is a no-op when the node
    // set IS the indexed corpus — the precondition this pin certifies.
    val model = IvfBuild.build(emb, 64)
    val deg16 = KnnJoin.knnGraph(emb, k = 16, Some(model))
    val derived = deg16.filter(col("rnk") <= 5).select("src", "dst", "rnk", "dist2")
    val direct = KnnJoin.knnGraph(emb, k = 5, Some(model)).select("src", "dst", "rnk", "dist2")
    assert(derived.exceptAll(direct).isEmpty && direct.exceptAll(derived).isEmpty,
      "rnk<=5 view of the degree-16 probed graph differs from the direct degree-5 build")
  }

  test("nn-descent construction: full coverage, contract shape, and exact-graph recall over the bar — no index anywhere") {
    val k = 4
    val g = KnnJoin.knnGraphDescent(emb, k).cache()
    val n = emb.count()
    // coverage: the circular random ladder guarantees every node seeds
    // ≥ 1 edge, and descent re-ranks supersets — no node may go silent
    val deg = g.groupBy("src").agg(
      count(lit(1)).as("d"),
      max("rnk").as("mr"),
      sum(when(col("src") === col("dst"), 1L).otherwise(0L)).as("selfs"))
    assert(deg.count() == n, "descent graph lost nodes (coverage)")
    assert(deg.filter(col("d") > k || col("mr") > k || col("selfs") =!= 0L).isEmpty,
      "descent graph violates the out-degree/self-edge contract")
    // membership: both ladders and the descent expansion only ever
    // reference node ids — dst must stay inside the node set
    assert(
      g.select(col("dst").as("vec_id"))
        .join(emb.select("vec_id"), Seq("vec_id"), "left_anti").isEmpty,
      "descent graph references a non-node id")
    // rank order must follow distance within each node
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src").orderBy("rnk")
    val disordered = g
      .withColumn("pd", lag("dist2", 1).over(w))
      .filter(col("pd").isNotNull && col("pd") > col("dist2"))
    assert(disordered.isEmpty, "rank order disagrees with distance order")
    // quality: edge recall vs the exact graph clears the same bar the
    // probed build is held to (the construction-default claim)
    val exactE = KnnJoin.knnGraph(emb, k).select("src", "dst").as[(Long, Long)].collect().toSet
    val gotE = g.select("src", "dst").as[(Long, Long)].collect().toSet
    val recallG = (exactE & gotE).size.toDouble / exactE.size
    assert(recallG >= 0.9, s"nn-descent construction edge recall $recallG below bar")
    g.unpersist()
  }
}
