package graft.streaming

import graft.SparkSpec
import graft.index.{IvfBuild, IvfModel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select("vec_id", "embedding").cache()

  test("streaming ingest inserts micro-batches into the IVF index via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val initial: IvfModel = IvfBuild.build(emb, 64)
    val n0 = initial.totalVectors

    val source = MemoryStream[(Long, Seq[Float])]
    val stream = source.toDF().toDF("vec_id", "embedding")
    val seen = new java.util.concurrent.atomic.AtomicReference[IvfModel](initial)
    val ckpt = java.nio.file.Files.createTempDirectory("ingest").toString
    val query = StreamingOps.ingest(stream, initial, ckpt, seen.set)
    try {
      source.addData((90001L, Seq.fill(64)(0.5f)), (90002L, Seq.fill(64)(-0.5f)))
      query.processAllAvailable()
      assert(seen.get().totalVectors == n0 + 2)
      source.addData((90003L, Seq.fill(64)(0.1f)))
      query.processAllAvailable()
      assert(seen.get().totalVectors == n0 + 3)
      val ids = seen.get().vectors.select("vec_id").as[Long].collect().toSet
      assert(ids.contains(90001L) && ids.contains(90003L))
    } finally query.stop()
  }

  test("hnswIngest grows the stack per micro-batch and re-delivered ids are an idempotent no-op") {
    implicit val sqlCtx = spark.sqlContext
    val initial = graft.index.Hnsw.build(emb, k = 6, shrink = 16, topCap = 256L)
      .map(l => graft.index.Hnsw.Layer(l.nodes, l.graph.cache()))
    val n0 = initial.last.nodes.count()
    def planted(i: Long) = (800000L + i, emb.filter(col("vec_id") === i)
      .select(transform(col("embedding"), x => x + lit(0.001f)))
      .as[Seq[Float]].head())
    val source = MemoryStream[(Long, Seq[Float])]
    val stream = source.toDF().toDF("vec_id", "embedding")
    val seen = new java.util.concurrent.atomic
      .AtomicReference[Seq[graft.index.Hnsw.Layer]](initial)
    val ckpt = java.nio.file.Files.createTempDirectory("hnsw_ingest").toString
    val query = StreamingOps.hnswIngest(
      stream, initial, ckpt, k = 6, beam = 16, rounds = 6, seen.set)
    try {
      val b1 = Seq(planted(0L), planted(1L))
      source.addData(b1: _*)
      query.processAllAvailable()
      assert(seen.get().last.nodes.count() == n0 + 2, "first batch did not land")
      val afterB1 = seen.get()
      // a foreachBatch epoch RETRY re-delivers the same rows — the ingest
      // must filter them out (idempotent), not die on insert's
      // duplicate-id guard or double-insert them
      source.addData(b1: _*)
      query.processAllAvailable()
      assert(query.isActive, "re-delivered batch killed the stream")
      assert(seen.get() eq afterB1, "a fully-replayed batch must not produce a new epoch")
      assert(seen.get().last.nodes.count() == n0 + 2, "replay changed the corpus")
      // and a genuinely new batch after the replay still lands
      source.addData(planted(2L))
      query.processAllAvailable()
      assert(seen.get().last.nodes.count() == n0 + 3, "post-replay batch did not land")
    } finally {
      query.stop()
      graft.rel.PipelineQueries.deleteRecursively(java.nio.file.Paths.get(ckpt))
      initial.foreach(_.graph.unpersist())
    }
  }

  test("hnswIngest delta log: batch-sized epochs recover a killed stream via loadLog, resumed = uninterrupted") {
    import graft.index.Hnsw
    val initial = Hnsw.build(emb, k = 6, shrink = 16, topCap = 256L)
      .map(l => Hnsw.Layer(l.nodes, l.graph.cache()))
    val tmp = java.nio.file.Files.createTempDirectory("hnsw_ingest_log").toString
    val logDir = s"$tmp/log"
    val ckpt = s"$tmp/ckpt"
    val inDir = s"$tmp/in"
    def planted(i: Long): (Long, Seq[Float]) = (810000L + i, emb.filter(col("vec_id") === i)
      .select(transform(col("embedding"), x => x + lit(0.001f)))
      .as[Seq[Float]].head())
    val a = Seq(planted(0L), planted(1L)).toDF("vec_id", "embedding")
    val b = Seq(planted(2L), planted(3L)).toDF("vec_id", "embedding")
    def stackEq(x: Seq[Hnsw.Layer], y: Seq[Hnsw.Layer], msg: String): Unit = {
      assert(x.length == y.length, s"$msg: depth differs")
      x.zip(y).foreach { case (p, q) =>
        val np = p.nodes.select("vec_id"); val nq = q.nodes.select("vec_id")
        assert(np.exceptAll(nq).isEmpty && nq.exceptAll(np).isEmpty, s"$msg: members differ")
        val gp = p.graph.select("src", "dst", "rnk"); val gq = q.graph.select("src", "dst", "rnk")
        assert(gp.exceptAll(gq).isEmpty && gq.exceptAll(gp).isEmpty, s"$msg: edges differ")
      }
    }
    try {
      // the log's base is written ONCE; every epoch thereafter is an
      // O(|batch|·k) delta keyed by the stable streaming batchId
      Hnsw.save(initial, 6, logDir)
      def incarnation(
          init: Seq[Hnsw.Layer],
          onUpd: Seq[Hnsw.Layer] => Unit): Unit = {
        val q = StreamingOps.hnswIngest(
          spark.readStream.schema(a.schema).parquet(inDir),
          init, ckpt, k = 6, beam = 16, rounds = 6, onUpd,
          onDelta = Some((id, ds) => Hnsw.saveDelta(ds, id, logDir)))
        try q.processAllAvailable()
        finally q.stop()
      }
      val live = new java.util.concurrent.atomic
        .AtomicReference[Seq[Hnsw.Layer]](initial)
      a.write.mode("append").parquet(inDir)
      incarnation(initial, live.set)
      val liveAfterA = live.get()
      // "kill": incarnation 1 stopped. A fresh consumer holds NOTHING in
      // memory — base + epoch 0 alone must reconstruct the post-A stack
      val recovered = Hnsw.loadLog(spark, logDir)
      stackEq(recovered.layers, liveAfterA, "log recovery after kill")
      // resume from the checkpoint with the log-recovered stack; stream B
      val resumed = new java.util.concurrent.atomic
        .AtomicReference[Seq[Hnsw.Layer]](recovered.layers)
      b.write.mode("append").parquet(inDir)
      incarnation(recovered.layers, resumed.set)
      // control: what an uninterrupted stream would hold
      val control = Hnsw.insert(liveAfterA, b, k = 6, beam = 16, rounds = 6)
      stackEq(resumed.get(), control, "resumed vs uninterrupted")
      // and the LOG alone reconstructs the final state — two epochs deep
      stackEq(Hnsw.loadLog(spark, logDir).layers, control, "full log replay")
    } finally {
      graft.rel.PipelineQueries.deleteRecursively(java.nio.file.Paths.get(tmp))
      initial.foreach(_.graph.unpersist())
    }
  }

  test("hnswIngest resumes from a SAVED artifact: loadStack's layers + its own meta parameters continue the stream, resumed = uninterrupted") {
    // the s21 bench row's integration certification, moved here (round-20
    // suite-cost cut, the s22/s23 pattern): kill-and-resume through the
    // Hnsw.save/loadStack path — onUpdate persists every epoch via save,
    // the resumed incarnation runs under the LOADED meta's own
    // shrink/topCap (the save-carries-its-build-parameters contract,
    // end-to-end), and the resumed final stack must LAYER-EQUAL the
    // uninterrupted continuation. The registered s21 row keeps the cheap
    // recovery/membership/meta flags.
    import graft.index.Hnsw
    val initial = Hnsw.build(emb, k = 6, shrink = 2, topCap = 30L)
      .map(l => Hnsw.Layer(l.nodes, l.graph.cache()))
    val tmp = java.nio.file.Files.createTempDirectory("hnsw_save_resume").toString
    val saveDir = s"$tmp/stack"; val ckpt = s"$tmp/ckpt"; val inDir = s"$tmp/in"
    def planted(i: Long): (Long, Seq[Float]) = (820000L + i, emb.filter(col("vec_id") === i)
      .select(transform(col("embedding"), x => x + lit(0.001f)))
      .as[Seq[Float]].head())
    val a = Seq(planted(0L), planted(1L)).toDF("vec_id", "embedding")
    val b = Seq(planted(2L), planted(3L)).toDF("vec_id", "embedding")
    def stackEq(x: Seq[Hnsw.Layer], y: Seq[Hnsw.Layer], msg: String): Unit = {
      assert(x.length == y.length, s"$msg: depth differs")
      x.zip(y).foreach { case (p, q) =>
        val np = p.nodes.select("vec_id"); val nq = q.nodes.select("vec_id")
        assert(np.exceptAll(nq).isEmpty && nq.exceptAll(np).isEmpty, s"$msg: members differ")
        val gp = p.graph.select("src", "dst", "rnk"); val gq = q.graph.select("src", "dst", "rnk")
        assert(gp.exceptAll(gq).isEmpty && gq.exceptAll(gp).isEmpty, s"$msg: edges differ")
      }
    }
    try {
      def incarnation(
          init: Seq[Hnsw.Layer],
          shrink: Int,
          topCap: Long,
          onUpd: Seq[Hnsw.Layer] => Unit): Unit = {
        val q = StreamingOps.hnswIngest(
          spark.readStream.schema(a.schema).parquet(inDir),
          init, ckpt, k = 6, beam = 16, rounds = 6, onUpd,
          shrink = shrink, topCap = topCap)
        try q.processAllAvailable()
        finally q.stop()
      }
      val live = new java.util.concurrent.atomic
        .AtomicReference[Seq[Hnsw.Layer]](initial)
      a.write.mode("append").parquet(inDir)
      incarnation(initial, 2, 30L, st => {
        live.set(st)
        Hnsw.save(st, 6, saveDir, shrink = 2, topCap = 30L)
      })
      val liveAfterA = live.get()
      // "kill": incarnation 1 stopped. A fresh consumer holds only the
      // saved artifact — loadStack must carry the build parameters back
      val loaded = Hnsw.loadStack(spark, saveDir)
      assert(loaded.k == 6 && loaded.shrink == 2 && loaded.topCap == 30L,
        s"meta round-trip lost the build parameters: k=${loaded.k} shrink=${loaded.shrink} topCap=${loaded.topCap}")
      stackEq(loaded.layers, liveAfterA, "saved-artifact recovery after kill")
      val resumed = new java.util.concurrent.atomic
        .AtomicReference[Seq[Hnsw.Layer]](loaded.layers)
      b.write.mode("append").parquet(inDir)
      incarnation(loaded.layers, loaded.shrink, loaded.topCap, resumed.set)
      // control: what an uninterrupted stream would hold — same
      // shrink/topCap as the stream's inserts (the level rule reads
      // them; a mismatched control diverges on upper-layer membership)
      val control = Hnsw.insert(liveAfterA, b, k = 6, beam = 16, rounds = 6,
        shrink = 2, topCap = 30L)
      stackEq(resumed.get(), control, "resumed vs uninterrupted")
    } finally {
      graft.rel.PipelineQueries.deleteRecursively(java.nio.file.Paths.get(tmp))
      initial.foreach(_.graph.unpersist())
    }
  }

  test("maintained ingest stays durable: an in-stream deepen re-bases the log, a kill recovers it, the next incarnation logs on") {
    import graft.index.Hnsw
    val initial = Hnsw.build(emb, k = 6, shrink = 2, topCap = 30L)
      .map(l => Hnsw.Layer(l.nodes, l.graph.cache()))
    val topN0 = initial.head.nodes.count()
    var topMod = 1L
    (0 until initial.length - 1).foreach(_ => topMod *= 2)
    // planted ids drawn FROM the hash-clearing set, so the top grows by
    // exactly 2 and the deepen trigger is deterministic — plus fillers
    // that clear neither the old top modulus nor (by divisibility) the
    // deepened one
    def idsWhere(clear: Boolean, n: Int): Seq[Long] = {
      val cond =
        if (clear) pmod(xxhash64(col("id")), lit(topMod)) === 0
        else pmod(xxhash64(col("id")), lit(topMod)) =!= 0
      spark.range(840000L, 1840000L).select(col("id")).filter(cond)
        .limit(n).as[Long].collect().toSeq
    }
    val baseEmb: Array[Seq[Float]] = emb.filter(col("vec_id") < 8)
      .orderBy("vec_id")
      .select(transform(col("embedding"), x => x + lit(0.001f)))
      .as[Seq[Float]].collect()
    val b1Ids = idsWhere(clear = true, 2) ++ idsWhere(clear = false, 3)
    val b1 = b1Ids.zipWithIndex.map { case (id, i) => (id, baseEmb(i)) }
      .toDF("vec_id", "embedding")
    val b2 = idsWhere(clear = false, 6).drop(3).zipWithIndex
      .map { case (id, i) => (id, baseEmb(5 + i)) }.toDF("vec_id", "embedding")
    def stackEq(x: Seq[Hnsw.Layer], y: Seq[Hnsw.Layer], msg: String): Unit = {
      assert(x.length == y.length, s"$msg: depth differs")
      x.zip(y).foreach { case (p, q) =>
        val np = p.nodes.select("vec_id"); val nq = q.nodes.select("vec_id")
        assert(np.exceptAll(nq).isEmpty && nq.exceptAll(np).isEmpty, s"$msg: members differ")
        val gp = p.graph.select("src", "dst", "rnk"); val gq = q.graph.select("src", "dst", "rnk")
        assert(gp.exceptAll(gq).isEmpty && gq.exceptAll(gp).isEmpty, s"$msg: edges differ")
      }
    }
    val tmp = java.nio.file.Files.createTempDirectory("hnsw_maint_log").toString
    val logDir = s"$tmp/log"; val ckpt = s"$tmp/ckpt"; val inDir = s"$tmp/in"
    try {
      Hnsw.save(initial, 6, logDir, shrink = 2, topCap = topN0)
      // the writer's fence token lives in a mutable cell: the rebase
      // hook refreshes it after save bumps the fence (the doc's pattern)
      val tok = new java.util.concurrent.atomic.AtomicLong(
        Hnsw.loadStack(spark, logDir).writerToken)
      val ticks = scala.collection.mutable.ArrayBuffer.empty[StreamingOps.HnswMaintainTick]
      def incarnation(
          init: Seq[Hnsw.Layer], sink: Seq[Hnsw.Layer] => Unit): Unit = {
        val q = StreamingOps.hnswIngest(
          spark.readStream.schema(b1.schema).parquet(inDir),
          init, ckpt, k = 6, beam = 16, rounds = 6, sink,
          shrink = 2, topCap = topN0,
          onDelta = Some((id, ds) => Hnsw.saveDelta(ds, id, logDir, tok.get())),
          autoDeepen = true, onMaintain = ticks += _,
          onRebase = Some { st =>
            Hnsw.save(st, 6, logDir, shrink = 2, topCap = topN0)
            tok.set(Hnsw.loadStack(spark, logDir).writerToken)
          })
        try q.processAllAvailable()
        finally q.stop()
      }
      val live = new java.util.concurrent.atomic
        .AtomicReference[Seq[Hnsw.Layer]](initial)
      b1.write.mode("append").parquet(inDir)
      incarnation(initial, live.set)
      assert(ticks.map(_.event) == Seq("deepen"), s"expected one deepen tick, got $ticks")
      val after1 = live.get()
      assert(after1.length == initial.length + 1, "deepen did not deepen the live stack")
      // search parity through the MAINTAINED stack: every planted row is
      // its own rank-1 hit — maintenance cost the search nothing. Moved
      // from the registered s23 row (round-19 suite-cost cut: the bench
      // row keeps the cadence/depth/bound/rule flags; the search-quality
      // certification lives here).
      val probes = b1.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val hits = graft.index.Hnsw.search(probes, after1, k = 1, beam = 16, rounds = 6)
        .filter(col("rnk") === 1)
      assert(hits.filter(col("query_id") === col("vec_id")).count() == b1Ids.length,
        "a planted row is not its own rank-1 hit through the maintained stack")
      // the rebase IS the durability: the log alone reconstructs the
      // MAINTAINED state, and the superseded epoch was swept
      stackEq(Hnsw.loadLog(spark, logDir).layers, after1, "log recovery after maintained kill")
      assert(!new java.io.File(logDir).listFiles().map(_.getName).exists(_.startsWith("epoch_")),
        "rebase left the superseded epoch behind")
      // a new incarnation resumes on the rebased base and logs a plain
      // epoch under the REFRESHED token — no deepen (fillers clear
      // neither modulus), no fence trip
      val resumed = new java.util.concurrent.atomic
        .AtomicReference[Seq[Hnsw.Layer]](after1)
      b2.write.mode("append").parquet(inDir)
      incarnation(Hnsw.loadLog(spark, logDir).layers, resumed.set)
      assert(ticks.map(_.event) == Seq("deepen"), "the post-rebase batch must not re-deepen")
      stackEq(Hnsw.loadLog(spark, logDir).layers, resumed.get(), "epoch folds onto the rebased base")
      assert(new java.io.File(logDir).listFiles().map(_.getName).count(_.startsWith("epoch_")) == 1,
        "the post-rebase batch must log exactly one epoch")
    } finally {
      graft.rel.PipelineQueries.deleteRecursively(java.nio.file.Paths.get(tmp))
      initial.foreach(_.graph.unpersist())
    }
  }

  test("hnswApplyChangelog: upserts replace, deletes erase, cross-batch changes resolve by arrival order") {
    import graft.index.Hnsw
    implicit val sqlCtx = spark.sqlContext
    val initial = Hnsw.build(emb, k = 6, shrink = 16, topCap = 256L)
      .map(l => Hnsw.Layer(l.nodes, l.graph.cache()))
    def embOf(i: Long, bump: Float): Seq[Float] = emb.filter(col("vec_id") === i)
      .select(transform(col("embedding"), x => x + lit(bump)))
      .as[Seq[Float]].head()
    val source = MemoryStream[(Long, Seq[Float], String, Long)]
    val stream = source.toDF().toDF("vec_id", "embedding", "op", "ord")
    val seen = new java.util.concurrent.atomic
      .AtomicReference[Seq[Hnsw.Layer]](initial)
    val ckpt = java.nio.file.Files.createTempDirectory("hnsw_cdc").toString
    val query = StreamingOps.hnswApplyChangelog(
      stream, initial, ckpt, k = 6, beam = 16, rounds = 6, seen.set)
    try {
      val x = 820000L
      // batch 1: insert NEW key x; erase live corpus key 5; delete of an
      // absent key is a no-op; an equal-key U-then-D pair resolves by ord
      source.addData(
        (x, embOf(0L, 0.001f), "U", 1L),
        (5L, embOf(5L, 0f), "D", 2L),
        (999999L, embOf(1L, 0f), "D", 3L),
        (x + 1, embOf(1L, 0.001f), "U", 4L),
        (x + 1, embOf(1L, 0.001f), "D", 5L))
      query.processAllAvailable()
      val after1 = seen.get()
      val l0 = after1.last.nodes
      assert(l0.filter(col("vec_id") === x).count() == 1, "upserted key did not land")
      assert(l0.filter(col("vec_id").isin(5L, x + 1)).isEmpty,
        "erased / U-then-D key survived the trigger")
      // batch 2 (ARRIVAL order across batches): key x — inserted by the
      // PREVIOUS batch — is now replaced with a new vector, then key 5
      // returns; the state must reflect the latest arrival, not history
      source.addData(
        (x, embOf(0L, 0.002f), "U", 1L),
        (5L, embOf(5L, 0.002f), "U", 2L))
      query.processAllAvailable()
      val fin = seen.get()
      val finL0 = fin.last.nodes
      assert(finL0.filter(col("vec_id") === x).count() == 1, "replaced key duplicated or lost")
      val gotX = finL0.filter(col("vec_id") === x)
        .select("embedding").as[Seq[Float]].head()
      assert(gotX == embOf(0L, 0.002f), "replacement did not take the LATEST vector")
      assert(finL0.filter(col("vec_id") === 5L).count() == 1, "re-upserted erased key missing")
      // batch 3: a MALFORMED row — null op on the present key x — must
      // UPSERT (the relational rank-0 rule: any op outside {U,D,I}, null
      // included, ranks with 'I'), never erase. A bare =!= "D" upsert
      // filter would let the presence screen delete x and then
      // null-filter it out of the re-insert — a silent erasure.
      source.addData((x, embOf(0L, 0.003f), null.asInstanceOf[String], 1L))
      query.processAllAvailable()
      val fin3 = seen.get()
      val l0b3 = fin3.last.nodes
      assert(l0b3.filter(col("vec_id") === x).count() == 1, "null-op key erased or duplicated")
      assert(l0b3.filter(col("vec_id") === x).select("embedding").as[Seq[Float]].head() ==
        embOf(0L, 0.003f), "null-op row did not upsert the newest vector")
      // structural hygiene after the full history: no dangling edges
      fin3.foreach { l =>
        val ids = l.nodes.select("vec_id")
        assert(
          l.graph.join(ids.withColumnRenamed("vec_id", "src"), Seq("src"), "left_anti").isEmpty &&
            l.graph.join(ids.withColumnRenamed("vec_id", "dst"), Seq("dst"), "left_anti").isEmpty,
          "edge references a non-member id after CDC history")
      }
    } finally {
      query.stop()
      graft.rel.PipelineQueries.deleteRecursively(java.nio.file.Paths.get(ckpt))
      initial.foreach(_.graph.unpersist())
    }
  }

  test("changelog replay guard: a re-delivered trigger with a published epoch is skipped — erasures stay erased through compaction") {
    import graft.index.Hnsw
    val initial = Hnsw.build(emb, k = 6, shrink = 16, topCap = 256L)
      .map(l => Hnsw.Layer(l.nodes, l.graph.cache()))
    val tmp = java.nio.file.Files.createTempDirectory("hnsw_cdc_replay").toString
    val logDir = s"$tmp/log"; val inDir = s"$tmp/in"
    val x = 830000L
    val batch = Seq(
      (x, emb.filter(col("vec_id") === 0L)
        .select(transform(col("embedding"), e => e + lit(0.001f))).as[Seq[Float]].head(), "U", 1L),
      (7L, emb.filter(col("vec_id") === 7L)
        .select(col("embedding")).as[Seq[Float]].head(), "D", 2L))
      .toDF("vec_id", "embedding", "op", "ord")
    def incarnation(
        init: Seq[Hnsw.Layer], ckpt: String,
        sink: Seq[Hnsw.Layer] => Unit): Unit = {
      val q = StreamingOps.hnswApplyChangelog(
        spark.readStream.schema(batch.schema).parquet(inDir),
        init, ckpt, k = 6, beam = 16, rounds = 6, sink,
        onDelta = Some((id, ds) => Hnsw.saveDelta(ds, id, logDir)),
        isEpochApplied = Some(id => Hnsw.epochExists(spark, logDir, id)))
      try q.processAllAvailable()
      finally q.stop()
    }
    try {
      Hnsw.save(initial, 6, logDir)
      val live = new java.util.concurrent.atomic
        .AtomicReference[Seq[Hnsw.Layer]](initial)
      batch.write.mode("append").parquet(inDir)
      incarnation(initial, s"$tmp/ckpt1", live.set)
      val recovered = Hnsw.loadLog(spark, logDir)
      assert(recovered.layers.last.nodes.filter(col("vec_id") === 7L).isEmpty,
        "erasure did not land in the log")
      // crash-between-publish-and-offset-commit stand-in: a FRESH
      // checkpoint re-delivers the same file as batch 0, whose epoch 0
      // is already published — the guard must skip it wholesale
      val resumed = new java.util.concurrent.atomic
        .AtomicReference[Seq[Hnsw.Layer]](recovered.layers)
      incarnation(recovered.layers, s"$tmp/ckpt2", resumed.set)
      assert(resumed.get() eq recovered.layers,
        "a replayed trigger with a published epoch must be a wholesale no-op")
      // the STRONG epoch survived (not a weaker recomputed one): after
      // compaction folds the log into the base, the erased key must
      // still be gone — this is exactly the resurrection the unguarded
      // replay would cause (the recomputed epoch would lose the delete
      // of the now-absent key 7, and the fold would revive it)
      val compacted = Hnsw.compact(spark, logDir)
      assert(compacted.layers.last.nodes.filter(col("vec_id") === 7L).isEmpty,
        "compaction resurrected an erased key — the log lost the delete")
      assert(compacted.layers.last.nodes.filter(col("vec_id") === x).count() == 1,
        "compaction lost the upserted key")
    } finally {
      graft.rel.PipelineQueries.deleteRecursively(java.nio.file.Paths.get(tmp))
      initial.foreach(_.graph.unpersist())
    }
  }

  // Moved OUT of the registered s22 bench row (round-19: the row re-ran
  // this whole certification — two incarnations + a three-step batch
  // control + per-layer edge equality — on every bench pass for ~55 s of
  // suite cost; the registered row keeps the cheap membership/epoch/
  // durability flags and this spec pins the full equivalence once).
  test("changelog stream equals the batch composition insert∘delete∘insert across a kill/restart through the delta log") {
    import graft.index.Hnsw
    val initial = Hnsw.build(emb, k = 6, shrink = 16, topCap = 256L)
      .map(l => Hnsw.Layer(l.nodes, l.graph.cache()))
    def embOf(i: Long, bump: Float): Seq[Float] = emb.filter(col("vec_id") === i)
      .select(transform(col("embedding"), x => x + lit(bump))).as[Seq[Float]].head()
    val x = 840000L
    // trigger A: 4 new-key upserts; trigger B (in a NEW incarnation):
    // replacement upserts of two live corpus keys, cross-restart erasure
    // of two trigger-A keys, a delete of an unknown key (no-op), and an
    // equal-key U-then-D pair whose higher ord must win
    val batchA = (0 until 4).map(i => (x + i, embOf(i.toLong, 0.001f), "U", i.toLong))
    val batchB = Seq(
      (3L, embOf(3L, 0.002f), "U", 10L),
      (4L, embOf(4L, 0.002f), "U", 11L),
      (x, embOf(0L, 0f), "D", 12L),
      (x + 1, embOf(1L, 0f), "D", 13L),
      (9999999L, embOf(2L, 0f), "D", 14L),
      (x + 2, embOf(2L, 0.003f), "U", 15L),
      (x + 2, embOf(2L, 0.003f), "D", 16L))
    val tmp = java.nio.file.Files.createTempDirectory("hnsw_cdc_equiv").toString
    val logDir = s"$tmp/log"; val inDir = s"$tmp/in"
    def toDf(rows: Seq[(Long, Seq[Float], String, Long)]) =
      rows.toDF("vec_id", "embedding", "op", "ord")
    def incarnation(
        init: Seq[Hnsw.Layer], token: Long, ckpt: String,
        sink: Seq[Hnsw.Layer] => Unit): Unit = {
      val q = StreamingOps.hnswApplyChangelog(
        spark.readStream.schema(toDf(batchA).schema).parquet(inDir),
        init, ckpt, k = 6, beam = 16, rounds = 6, sink,
        onDelta = Some((id, ds) => Hnsw.saveDelta(ds, id, logDir, token)),
        isEpochApplied = Some(id => Hnsw.epochExists(spark, logDir, id)))
      try q.processAllAvailable()
      finally q.stop()
    }
    try {
      Hnsw.save(initial, 6, logDir)
      val live1 = new java.util.concurrent.atomic
        .AtomicReference[Seq[Hnsw.Layer]](initial)
      toDf(batchA).write.mode("append").parquet(inDir)
      incarnation(initial, Hnsw.loadStack(spark, logDir).writerToken, s"$tmp/ckpt", live1.set)
      // "kill": a fresh consumer recovers THROUGH the log, not a save
      val recovered = Hnsw.loadLog(spark, logDir)
      val live2 = new java.util.concurrent.atomic
        .AtomicReference[Seq[Hnsw.Layer]](recovered.layers)
      toDf(batchB).write.mode("append").parquet(inDir)
      incarnation(recovered.layers, recovered.writerToken, s"$tmp/ckpt", live2.set)
      val fin = live2.get()
      // control: the batch composition of the SAME collapsed changes
      val ctlA = Hnsw.insert(initial, toDf(batchA).select("vec_id", "embedding"),
        k = 6, beam = 16, rounds = 6, validate = false)
      val ctlDel = Hnsw.delete(ctlA,
        Seq(3L, 4L, x, x + 1, x + 2).toDF("vec_id"), k = 6)
      val ctl = Hnsw.insert(ctlDel,
        Seq((3L, embOf(3L, 0.002f)), (4L, embOf(4L, 0.002f))).toDF("vec_id", "embedding"),
        k = 6, beam = 16, rounds = 6, validate = false)
      assert(fin.length == ctl.length, s"depth ${fin.length} vs control ${ctl.length}")
      fin.zip(ctl).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.nodes.select("vec_id").exceptAll(b.nodes.select("vec_id"))
          .unionAll(b.nodes.select("vec_id").exceptAll(a.nodes.select("vec_id"))).isEmpty,
          s"layer $i node sets diverge from the batch composition")
        val ga = a.graph.select("src", "dst", "rnk")
        val gb = b.graph.select("src", "dst", "rnk")
        assert(ga.exceptAll(gb).unionAll(gb.exceptAll(ga)).isEmpty,
          s"layer $i edge sets diverge from the batch composition")
      }
      // and the log replays to the live final state (delete durability)
      val replayed = Hnsw.loadLog(spark, logDir).layers
      replayed.zip(fin).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.nodes.select("vec_id").exceptAll(b.nodes.select("vec_id"))
          .unionAll(b.nodes.select("vec_id").exceptAll(a.nodes.select("vec_id"))).isEmpty,
          s"replayed layer $i diverges from the live stack")
      }
    } finally {
      graft.rel.PipelineQueries.deleteRecursively(java.nio.file.Paths.get(tmp))
      initial.foreach(_.graph.unpersist())
    }
  }

  test("applyChangelogStream folds key-disjoint micro-batches to the batch MERGE answer") {
    implicit val sqlCtx = spark.sqlContext
    val snapshot = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    // batch 1: update k=1, insert k=4; batch 2: delete k=2, update k=4
    // (cross-batch sequencing: the later batch sees batch 1's insert)
    val source = MemoryStream[(Long, Long, String, Double)]
    val stream = source.toDF().toDF("k", "ord", "op", "v")
    val (query, state) = StreamingOps.applyChangelogStream(stream, snapshot, "k", "ord", "op")
    try {
      source.addData((1L, 1L, "U", 11.0), (4L, 1L, "I", 40.0))
      query.processAllAvailable()
      assert(state.get().orderBy("k").as[(Long, Double)].collect().toSeq ==
        Seq((1L, 11.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)))
      source.addData((2L, 2L, "D", 0.0), (4L, 2L, "U", 41.0))
      query.processAllAvailable()
      assert(state.get().orderBy("k").as[(Long, Double)].collect().toSeq ==
        Seq((1L, 11.0), (3L, 30.0), (4L, 41.0)))
    } finally query.stop()
  }

  test("adaptiveMaintain splits the partition the query stream heats — and only then") {
    implicit val sqlCtx = spark.sqlContext
    val initial: IvfModel = IvfBuild.build(emb, 64)
    val target = initial.partitions.maxBy(_.size)
    // splitSize 1.4x the largest partition: COLD the clamped threshold
    // (>= splitSize/1.5 = 0.933x size... but raw = splitSize > size) sits
    // above the partition, so only accumulated hotness can pull it under
    val splitSize = math.ceil(target.size * 1.4).toLong
    val qvec: Seq[Float] = target.centroid.toSeq

    val source = MemoryStream[(Long, Seq[Float])]
    val stream = source.toDF().toDF("query_id", "qvec")
    val ticks = scala.collection.mutable.ArrayBuffer.empty[StreamingOps.MaintainTick]
    val ckpt = java.nio.file.Files.createTempDirectory("adapt").toString
    val (query, state) = StreamingOps.adaptiveMaintain(
      stream, initial, ckpt,
      hotQpsWindow = 50.0, splitSize = splitSize, mergeSize = 0L,
      onTick = ticks += _)
    try {
      // 50 on-target queries: hotness 50 → raw threshold = splitSize > size
      // still — no split may fire
      source.addData((0 until 50).map(i => (i.toLong, qvec)): _*)
      query.processAllAvailable()
      assert(ticks.forall(!_.maintain_fired), s"cold split fired: $ticks")
      assert(state.get().partitions.length == initial.partitions.length)
      // 50 more: hotness ~100 ≥ 70 pulls the floor (0.933x size) under the
      // partition — the split must fire DURING the stream
      source.addData((50 until 100).map(i => (i.toLong, qvec)): _*)
      query.processAllAvailable()
      val after = state.get()
      assert(ticks.exists(_.maintain_fired), s"no split despite heat: $ticks")
      assert(after.partitions.length == initial.partitions.length + 1)
      // the split child is fresh state stamped at the split-time counter
      val child = after.partitions.last
      assert(child.hits == 0L && child.lastSplitAt > 0L)
      // the heated partition was the one split: its size dropped
      assert(after.partitions(target.pid.toInt).size < target.size)
      assert(after.partitions(target.pid.toInt).size + child.size == target.size)
    } finally query.stop()
  }

  test("windowed event stats aggregate by event-time tumbling window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = source.toDF().toDF("ts", "event_type", "value")
    val out = StreamingOps.windowedEventStats(events, watermarkDelay = "1 hour", windowLen = "1 hour")
    val query = out.writeStream.format("memory").queryName("winstats").outputMode("append").start()
    try {
      def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      source.addData((ts(1, 10), "click", 1.0), (ts(1, 40), "click", 2.0), (ts(2, 5), "view", 5.0))
      query.processAllAvailable()
      // advance watermark far enough to close the 01:00 and 02:00 windows
      source.addData((ts(9, 0), "view", 0.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_events, sum_value FROM winstats ORDER BY window_start, event_type")
        .as[(String, Long, Double)].collect().toSeq
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally query.stop()
  }

  test("windowed event stats from a FILE source match the batch aggregation") {
    // same watermark+window plan fed by a parquet directory — the
    // production shape (no driver-collected MemoryStream feed); a sentinel
    // file lands later to advance the watermark so every window closes
    val dir = java.nio.file.Files.createTempDirectory("graft_filesrc").toString
    val ev = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts"), col("event_type"), col("value").cast("double"))
    ev.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(ev.schema).parquet(s"$dir/in")
    val out = StreamingOps.windowedEventStats(stream, watermarkDelay = "1 hour", windowLen = "1 day")
    val query = out.writeStream.format("memory").queryName("filewinstats").outputMode("append").start()
    try {
      query.processAllAvailable()
      val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
      Seq((new java.sql.Timestamp(maxTs.getTime + 40L * 24 * 3600 * 1000), "__sentinel", 0.0))
        .toDF("ts", "event_type", "value").write.mode("append").parquet(s"$dir/in")
      query.processAllAvailable()
    } finally query.stop()
    def shaped(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") =!= "__sentinel")
      .select(
        col("window_start"),
        col("event_type"),
        col("n_events"),
        round(col("sum_value"), 2).as("sum_value"), // sums rounded: partial-agg order differs
        col("min_value"),
        col("max_value"))
      .collect().toSet
    val batch = ev
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum("value").as("sum_value"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("min_value"), col("max_value"))
    val streamedSet = shaped(spark.table("filewinstats"))
    assert(streamedSet.nonEmpty)
    assert(streamedSet == shaped(batch))
    spark.catalog.dropTempView("filewinstats")
  }

  test("intervalJoin matches the interval rule, including matches ACROSS micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamingOps.intervalJoin(
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      purchases.toDF().toDF("user_id", "purchase_id", "purchase_ts"),
      "user_id", "click_ts", "purchase_ts",
      watermarkDelay = "10 minutes", maxLag = "30 MINUTES")
    val query = joined.writeStream.format("memory").queryName("ivj").outputMode("append").start()
    try {
      clicks.addData((1L, 100L, ts(0)), (1L, 101L, ts(50)), (2L, 102L, ts(5)))
      purchases.addData((1L, 200L, ts(20)), (2L, 201L, ts(40)), (1L, 202L, ts(60)))
      query.processAllAvailable()
      // a buffered click must still match a purchase arriving in a LATER batch
      purchases.addData((1L, 203L, ts(75)))
      query.processAllAvailable()
      val got = spark.table("ivj").select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      // 100@0 → 200@20 (lag 20 ≤ 30) but NOT 202@60; 101@50 → 202@60 and
      // 203@75 (cross-batch); 102@5 (user 2) ↛ 201@40 (lag 35 > 30);
      // user mismatch never joins
      assert(got == Set((100L, 200L), (101L, 202L), (101L, 203L)))
    } finally {
      query.stop()
      spark.catalog.dropTempView("ivj")
    }
  }

  test("intervalJoin left_outer emits dropouts exactly once, only after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamingOps.intervalJoin(
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      purchases.toDF().toDF("user_id", "purchase_id", "purchase_ts"),
      "user_id", "click_ts", "purchase_ts",
      watermarkDelay = "10 minutes", maxLag = "30 MINUTES", joinType = "left_outer")
    val query = joined.writeStream.format("memory").queryName("ivjo").outputMode("append").start()
    try {
      // click 100 converts; click 101 never does (user 2 has no purchase)
      clicks.addData((1L, 100L, ts(0)), (2L, 101L, ts(0)))
      purchases.addData((1L, 200L, ts(20)))
      query.processAllAvailable()
      def rows() = spark.table("ivjo")
        .select(col("click_id"), col("purchase_id"))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      // dropout must NOT emit yet — a purchase inside the lag window could
      // still arrive (watermark hasn't passed ts(0) + 30m + 10m)
      assert(rows() == Set((100L, Some(200L))), s"premature dropout: ${rows()}")
      // advance BOTH watermarks past the horizon → the dropout flushes
      clicks.addData((99L, 900L, ts(200)))
      purchases.addData((99L, 901L, ts(200)))
      query.processAllAvailable()
      clicks.addData((98L, 902L, ts(400)))
      purchases.addData((98L, 903L, ts(400)))
      query.processAllAvailable()
      assert(rows().contains((101L, None)), s"dropout never flushed: ${rows()}")
      assert(rows().count(_._1 == 101L) == 1, "dropout must emit exactly once")
    } finally {
      query.stop()
      spark.catalog.dropTempView("ivjo")
    }
  }

  test("dedupExact drops within-watermark replays ACROSS micro-batches; state is keyed, not history") {
    // batch 1 introduces keys a,b; batch 2 replays a (inside the watermark
    // horizon, later event time) and introduces c — the replay must be
    // dropped by carried state, the new key must pass
    val dir = java.nio.file.Files.createTempDirectory("graft_dedupstream").toString
    def batch(rows: Seq[(Long, String)]) = rows
      .map { case (sec, k) => (new java.sql.Timestamp(1700000000000L + sec * 1000L), k) }
      .toDF("ts", "key")
    batch(Seq((0L, "a"), (1L, "b"))).write.mode("overwrite").parquet(s"$dir/in")
    val schema = batch(Seq((0L, "a"))).schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val out = StreamingOps.dedupExact(stream, "ts", Seq("key"), watermarkDelay = "1 hour")
    val query = out.writeStream.format("memory").queryName("dedupstream").outputMode("append").start()
    try {
      query.processAllAvailable()
      batch(Seq((5L, "a"), (6L, "c"))).write.mode("append").parquet(s"$dir/in")
      query.processAllAvailable()
    } finally query.stop()
    val keys = spark.table("dedupstream").select("key").collect().map(_.getString(0)).toSeq
    assert(keys.sorted == Seq("a", "b", "c")) // exactly one "a": the replay was deduped
    spark.catalog.dropTempView("dedupstream")
  }

  private def sessTs(mins: Long) = new java.sql.Timestamp(1700000000000L + mins * 60000L)
  private def sessEv(uid: Long, mins: Long, eid: Long) =
    SessionEvent(uid, sessTs(mins), (1700000000000L + mins * 60000L) * 1000L, eid)

  test("sessionize: gap splits emit inline; event-time timeout flushes the open tail") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessionEvent]
    val out = StreamingOps.sessionize(source.toDS().withWatermark("ts", "10 minutes").as[SessionEvent], gapUs = 30L * 60 * 1000000L)
    val query = out.writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: events at t=0,10 then t=100 (gap 90 min > 30) then t=110
      // user 2: one lone event
      source.addData(sessEv(1, 0, 1), sessEv(1, 10, 2), sessEv(1, 100, 3), sessEv(1, 110, 4), sessEv(2, 5, 5))
      query.processAllAvailable()
      val inline = spark.table("sessions").as[SessionRow].collect().toSet
      // first session of user 1 closed INLINE by the t=100 event; user 2's
      // lone session timed out already — the batch's own max event time
      // (t=110, watermark t=100) passed its gap horizon (t=35), so the
      // post-batch no-data cycle flushed it. That is the state bound doing
      // its job with no sentinel involved.
      assert(inline == Set(
        SessionRow(1L, 1L, 2L, sessEv(1, 0, 1).us, 10L * 60 * 1000000L),
        SessionRow(2L, 1L, 1L, sessEv(2, 5, 5).us, 0L)))
      // sentinel advances the watermark past every open session's horizon
      source.addData(sessEv(99, 100000, 9))
      query.processAllAvailable()
      source.addData(sessEv(99, 200000, 10))
      query.processAllAvailable()
      val flushed = spark.table("sessions").as[SessionRow].collect().toSet
      assert(flushed.contains(SessionRow(1L, 2L, 2L, sessEv(1, 100, 3).us, 10L * 60 * 1000000L)))
      assert(flushed.contains(SessionRow(2L, 1L, 1L, sessEv(2, 5, 5).us, 0L)))
      // user 2 returns AFTER its session was timeout-flushed (at an event
      // time past the sentinel-advanced watermark of t=199990, else the
      // row is dropped as late): the counter tombstone must keep numbering
      // (session_idx 2, not a restart at 1)
      source.addData(sessEv(2, 250000, 6))
      query.processAllAvailable()
      source.addData(sessEv(99, 400000, 11))
      query.processAllAvailable()
      source.addData(sessEv(99, 500000, 12))
      query.processAllAvailable()
      val cont = spark.table("sessions").as[SessionRow].collect().toSet
      assert(cont.contains(SessionRow(2L, 2L, 1L, sessEv(2, 250000, 6).us, 0L)),
        s"counter must survive the timeout flush, got $cont")
    } finally query.stop()
    spark.catalog.dropTempView("sessions")
  }

  test("sessionize matches the batch q22 sessionization on the fixture events") {
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 30L * 60 * 1000000L
    val ev = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"), col("event_id"))
    val source = MemoryStream[SessionEvent]
    val out = StreamingOps.sessionize(source.toDS().withWatermark("ts", "1 minute").as[SessionEvent], gapUs)
    val query = out.writeStream.format("memory").queryName("fixsessions").outputMode("append").start()
    try {
      source.addData(ev.as[SessionEvent].collect().toSeq)
      query.processAllAvailable()
      val maxUs = ev.agg(max("us")).head.getLong(0)
      source.addData(SessionEvent(-1L, new java.sql.Timestamp(maxUs / 1000L + 40L * 24 * 3600 * 1000), maxUs + 1L, -1L))
      query.processAllAvailable()
      source.addData(SessionEvent(-1L, new java.sql.Timestamp(maxUs / 1000L + 80L * 24 * 3600 * 1000), maxUs + 2L, -2L))
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("fixsessions").as[SessionRow].collect()
      .filter(_.user_id >= 0).map(r => (r.user_id, r.session_idx, r.n_events, r.start_us, r.dur_us)).toSet
    // independent batch formulation (the q22 window plan)
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
    val batch = ev
      .withColumn("prev", lag("us", 1).over(wOrd))
      .withColumn("is_new", when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum("is_new").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"), min("us").as("start_us"), (max(col("us")) - min(col("us"))).as("dur_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed == batch)
    spark.catalog.dropTempView("fixsessions")
  }

  test("decontaminateStream flags contaminated docs once, ACROSS micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Long) = new java.sql.Timestamp(m * 60000L)
    val docs = source.toDF.toDF("doc_id", "text", "ts")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val benchShingles = graft.text.TextOps.shingleRows(bench, 5, distinctSet = true).select("s").distinct()
    val out = StreamingOps.decontaminateStream(docs, benchShingles, 5, "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("s06_test").outputMode("append").start()
    try {
      // batch 1: one contaminated doc (full 5-gram overlap), one clean
      source.addData(
        (1L, "alpha beta gamma delta epsilon", ts(1)),
        (2L, "totally unrelated words here now", ts(1)))
      q.processAllAvailable()
      // batch 2: the SAME contaminated doc replayed (within watermark:
      // must not re-emit) + a new contaminated one
      source.addData(
        (1L, "alpha beta gamma delta epsilon", ts(2)),
        (3L, "beta gamma delta epsilon zeta", ts(2)))
      q.processAllAvailable()
      val got = spark.table("s06_test").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 3L), s"got $got")
    } finally {
      q.stop()
      spark.catalog.dropTempView("s06_test")
    }
  }

  test("streaming CMS grid accumulates across micro-batches to exactly the batch sketch; state is grid-bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val toks = source.toDF.toDF("tok")
    val grid = StreamingOps.cmsSketchStream(toks, "tok", depth = 4, width = 64)
    val q = grid.writeStream.format("memory").queryName("s09_test").outputMode("complete").start()
    try {
      source.addData("a", "b", "a", "c")
      q.processAllAvailable()
      source.addData("a", "c", "d", "d", "d")
      q.processAllAvailable()
      val streamed = spark.table("s09_test")
        .select("row_j", "cell", "cnt").as[(Int, Long, Long)].collect().toSet
      val batch = graft.text.Cms
        .sketch(Seq("a", "b", "a", "c", "a", "c", "d", "d", "d").toDF("tok"), "tok", 4, 64)
        .select("row_j", "cell", "cnt").as[(Int, Long, Long)].collect().toSet
      assert(streamed == batch, "streamed grid must equal the batch sketch of the same rows")
      // state bound: the grid can never exceed depth × width cells
      assert(streamed.size <= 4 * 64)
      // total mass per row = total token occurrences (9)
      assert(streamed.groupBy(_._1).forall(_._2.toSeq.map(_._3).sum == 9L))
    } finally {
      q.stop()
      spark.catalog.dropTempView("s09_test")
    }
  }

  test("lshScreenStream accumulates the batch screen's pairs ACROSS micro-batches") {
    // corpus of 12 long docs; delta = near-copies of docs 1..6 (suffix
    // truncated) split over 3 files → 3 micro-batches, each screening
    // only its own documents against the one prebuilt corpus index
    def text(i: Long) = (1 to 40).map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" ")
    val corpus = (1L to 12L).map(i => (i, text(i))).toDF("doc_id", "text")
    val delta = (1L to 6L)
      .map(i => (i + 1000L, text(i).split(" ").drop(2).mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_s10_test").toString
    delta.repartition(3).write.mode("overwrite").parquet(s"$dir/in")

    val idx = graft.text.Dedup.lshIndex(corpus, shingleN = 3, numHashes = 32, bands = 16)
    val stream = spark.readStream
      .schema(delta.schema).option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val (q, state) = StreamingOps.lshScreenStream(idx, stream, minEstJaccard = 0.5)
    try q.processAllAvailable()
    finally q.stop()

    val streamed = state.get()
      .select("delta_id", "corpus_id", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.text.Dedup
      .minhashLshAgainstIndex(idx, delta, minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    // every planted near-copy recovered
    assert((1L to 6L).forall(i => streamed.exists(p => p._1 == i + 1000L && p._2 == i)))
    graft.CacheScope.clear()
  }
}
