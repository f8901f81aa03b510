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
}
