package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** [engine-added] Beam-search calibration probe (the [[DepthProbe]]
  * sibling for the graph-ANN path): measures mean recall@10 of
  * [[graft.index.GraphSearch.search]] over the NN-descent-refined k-NN
  * graph for a grid of (entries, beam, rounds) configs, at whatever
  * corpus the given dir holds — run at 1× and 10× to pick density-robust
  * defaults for v35. Usage: `runMain graft.bench.BeamProbe <sfDir>`. */
object BeamProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BeamProbe <sfDir>")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables.t
    import graft.rel.PipelineQueries.indexFor

    val nodes = t(spark, dir, "embeddings").select("vec_id", "embedding")
    val n = nodes.count()
    val q = nodes.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = graft.index.KnnJoin.exact(q, nodes, 10).cache()
    println(s"BEAM corpus n=$n")

    def entriesOf(e: Int): Seq[Long] =
      nodes.select(col("vec_id"))
        .orderBy(pmod(xxhash64(col("vec_id")), lit(9973L)), col("vec_id"))
        .limit(e).collect().map(_.getLong(0)).toSeq

    val model = indexFor(spark, dir)
    // coarse per-query seeds: a deliberately cheap IVF pass (few probes,
    // tiny k) — the hierarchical-router role, not the answer
    val ivfSeeds = graft.index.IvfSearch
      .search(model, q, graft.index.IvfSearch.Params(k = 4, targetRecall = 0.5, maxProbe = 2))
      .select("query_id", "vec_id").cache()

    for (gk <- Seq(5, 8)) {
      val seed = graft.index.KnnJoin.knnGraph(nodes, gk, Some(model)).cache()
      val refined = graft.index.KnnJoin.nnDescentRound(seed, nodes, gk).cache()
      for ((beam, rounds) <- Seq((32, 4), (32, 8), (64, 4), (64, 8))) {
        val t0 = System.nanoTime()
        val got = graft.index.GraphSearch
          .searchFrom(q, refined, nodes, ivfSeeds, k = 10, beam = beam, rounds = rounds)
        val rec = graft.index.IvfSearch.recallAtK(got, exact, 10, q)
          .agg(avg("recall")).head().getDouble(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"BEAM seeded gk=$gk beam=$beam%-3d rounds=$rounds%-3d recall=$rec%.3f sec=$sec%.1f")
      }
      refined.unpersist(); seed.unpersist()
    }
    spark.stop()
  }
}
