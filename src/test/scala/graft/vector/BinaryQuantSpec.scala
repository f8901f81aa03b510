package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def vec(dim: Int): Array[Float] = Array.fill(dim)(rnd.nextFloat() - 0.5f)

  test("packed code equals the per-dimension sign bits, 32 per word") {
    val dim = 70 // exercises a partial last word
    val rows = (0L until 20L).map(i => (i, vec(dim)))
    val out = BinaryQuant.encode(rows.toDF("vec_id", "embedding"), dim)
      .select("vec_id", "embedding", "code").collect()
    assert(out.head.getSeq[Long](2).length == 3)
    out.foreach { r =>
      val emb = r.getSeq[Float](1)
      val code = r.getSeq[Long](2)
      for (i <- 0 until dim) {
        val bit = (code(i / 32) >> (i % 32)) & 1L
        assert((bit == 1L) == (emb(i) > 0f), s"bit $i of vec ${r.getLong(0)}")
      }
      // 32-bit packing must never touch the long's upper half
      code.foreach(w => assert(w >= 0L && w < (1L << 32)))
    }
  }

  test("codegen hamming equals unpacked sign-disagreement count") {
    val dim = 64
    val rows = (0L until 30L).map(i => (i, vec(dim)))
    val df = BinaryQuant.encode(rows.toDF("vec_id", "embedding"), dim)
    val a = df.select(col("vec_id"), col("embedding").as("ea"), col("code").as("ca"))
    val b = df.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("code").as("cb"))
    val pairs = a.crossJoin(b)
      .select(
        BinaryQuant.hamming(col("ca"), col("cb")).as("hd"),
        expr("aggregate(zip_with(ea, eb, (x, y) -> IF((x > 0F) != (y > 0F), 1, 0)), 0, (acc, v) -> acc + v)")
          .as("naive"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("hamming is NULL on length mismatch") {
    val df = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
    assert(df.select(BinaryQuant.hamming(col("a"), col("b"))).head().isNullAt(0))
  }

  test("topK recall vs exact scan clears 0.9 at rerank=4 and self-query ranks first") {
    // Clustered corpus (10 centroids + small noise), the shape sign-bit
    // codes are built for — uniform-random vectors are the adversarial
    // case (hamming decorrelates from L2) and get a looser bar below.
    val dim = 64
    val centroids = Array.fill(10)(vec(dim))
    val corpus = (0L until 400L).map { i =>
      val c = centroids((i % 10).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val approx = BinaryQuant.topK(corpus, queries, dim, k = 10, rerank = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // self-vector is at hamming 0 and L2 0 → must be rank 1
    approx.filter(_._2 == 1).foreach { case (q, _, id) => assert(q == id) }
    val exact = TopK.perQuery(
      corpus.crossJoin(queries)
        .select(col("query_id"), VectorOps.l2Sq(col("embedding"), col("qvec")).as("dist2"), col("vec_id")),
      10).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hit = approx.count { case (q, _, id) => exact.contains((q, id)) }
    val recall = hit.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below the 0.9 bar")
  }

  test("ivfTopK: full-probe ≡ plain scan (corpus-global codes), saved codes ≡ fresh codes") {
    val dim = 32
    val centroids = Array.fill(6)(vec(dim))
    val corpus = (0L until 240L).map { i =>
      val c = centroids((i % 6).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
    val model = graft.index.IvfBuild.build(corpus, dim)
    val queries = corpus.filter(col("vec_id") < 6)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val fresh = BinaryQuant.encodeWithPartition(model.vectors, dim)

    val tmp = java.nio.file.Files.createTempDirectory("bq_spec_")
    try {
      BinaryQuant.saveCodes(fresh, tmp.toString)
      val loaded = BinaryQuant.loadCodes(spark, tmp.toString)
      assert(
        loaded.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq ==
          fresh.select(col("vec_id").cast("long"), col("partition_id").cast("long"), col("code"))
            .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq,
        "save -> load must be bit-identical")

      // every (query, partition) probed → pruning is a no-op and the
      // composed path must equal the plain full-scan topK exactly
      val allParts = model.vectors.select(col("partition_id")).distinct()
      val probes = queries.select("query_id").crossJoin(allParts)
      val cands = BinaryQuant.ivfTopK(loaded, probes, queries, dim, k = 5, rerank = 4)
      val composed = Pq.rerankExact(cands, corpus, queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
      val plain = BinaryQuant.topK(corpus, queries, dim, k = 5, rerank = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
      assert(composed == plain, "full-probe composed path must equal the plain scan")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("uniform-random corpus (adversarial for sign bits) still clears 0.6 at rerank=4") {
    val dim = 64
    val corpus = (0L until 400L).map(i => (i, vec(dim))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val approx = BinaryQuant.topK(corpus, queries, dim, k = 10, rerank = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = TopK.perQuery(
      corpus.crossJoin(queries)
        .select(col("query_id"), VectorOps.l2Sq(col("embedding"), col("qvec")).as("dist2"), col("vec_id")),
      10).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.6, s"uniform-corpus recall $recall below the 0.6 sanity bar")
  }
}
