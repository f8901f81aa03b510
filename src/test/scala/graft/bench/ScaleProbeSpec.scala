package graft.bench

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The scaled corpora must preserve per-replica query structure — in
  * particular the planted-pair machinery must keep WORKING on replica-
  * shifted ids (round-12 review: d16's original intersection join
  * classified docs by id magnitude and went degenerate at replica 1+). */
class ScaleProbeSpec extends SparkSpec {

  test("d16 on a replica-shifted corpus still audits every replica's planted pairs") {
    val base = java.nio.file.Files.createTempDirectory("scaleprobe_spec_").toString
    try {
      val dir = ScaleProbe.buildDir(spark, "/root/testdata/sf0.001", 2, base)
      val out = graft.SparkEntry.queries("d16_minhash_estimator_audit")(spark, dir)
      val rows = out.select("doc_a", "jaccard").collect()
      graft.CacheScope.clear()
      assert(rows.nonEmpty)
      val (rep0, rep1) = rows.partition(_.getLong(0) < 10000000L)
      assert(rep0.nonEmpty && rep1.nonEmpty, "both replicas must contribute audited pairs")
      // replica-1 pairs must have REAL jaccard values (the id-magnitude
      // bug zeroed every replica-1 intersection)
      assert(rep1.forall(_.getDouble(1) > 0.5),
        s"replica-1 planted pairs must overlap their sources: ${rep1.take(3).mkString(",")}")
    } finally {
      graft.rel.PipelineQueries.deleteRecursively(java.nio.file.Paths.get(base))
    }
  }

  test("scaled embeddings: rotation preserves counts and vector norms") {
    val base = java.nio.file.Files.createTempDirectory("scaleprobe_spec_").toString
    try {
      val dir = ScaleProbe.buildDir(spark, "/root/testdata/sf0.001", 3, base)
      val orig = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val scaled = spark.read.parquet(s"$dir/embeddings.parquet")
      assert(scaled.count() == 3 * orig.count())
      val norm = (c: org.apache.spark.sql.Column) =>
        aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
      val a = orig.agg(sum(norm(col("embedding")))).head().getDouble(0)
      val b = scaled.agg(sum(norm(col("embedding")))).head().getDouble(0)
      assert(math.abs(b - 3 * a) < 1e-6 * math.abs(3 * a), s"rotation must preserve norms: $a vs $b")
    } finally {
      graft.rel.PipelineQueries.deleteRecursively(java.nio.file.Paths.get(base))
    }
  }

  test("bounded-work rows publish the tag, never a fitted exponent; restrictions validate loudly") {
    import ScaleProbe.{Point, Result}
    // v31 is the registered bounded-work query: both probe points sit at
    // the launch floor, so the JSON must carry bounded:true and NO exp
    // (r17's record published a physically meaningless -0.448 for it)
    val r = Result(Seq(
      Point("v31_knn_graph", 1.2, 1.1, -0.038),
      Point("d03_ngram_jaccard", 2.5, 5.0, 0.301)), Nil)
    val js = ScaleProbe.toJson(10, r)
    assert(js.contains(""""v31_knn_graph":{"t1":1.2,"tk":1.1,"bounded":true}"""),
      s"bounded row must publish the tag: $js")
    assert(!js.contains(""""v31_knn_graph":{"t1":1.2,"tk":1.1,"exp""""),
      s"bounded row must not publish an exponent: $js")
    assert(js.contains(""""d03_ngram_jaccard":{"t1":2.5,"tk":5.0,"exp":0.301}"""),
      s"unbounded rows keep their exponent: $js")
    // a typo'd single-query restriction must fail loudly, not produce a
    // green-looking probe that measured nothing
    val e = intercept[IllegalArgumentException](
      ScaleProbe.run(spark, "/root/testdata/sf0.001", 2, Some(Set("d3_ngram_jaccard"))))
    assert(e.getMessage.contains("unknown probe queries"), s"wrong failure: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException](
      ScaleProbe.run(spark, "/root/testdata/sf0.001", 2, Some(Set.empty[String])))
    assert(e2.getMessage.contains("empty"), s"wrong failure: ${e2.getMessage}")
  }
}
