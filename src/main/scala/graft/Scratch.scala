package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/graft_sf1/x10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    import graft.rel.PipelineQueries
    import graft.index._
    val nodes = graft.Tables.t(s, dir, "embeddings").select("vec_id", "embedding")
    val built = Hnsw.build(nodes, k = 8, Some(PipelineQueries.indexFor(s, dir)), shrink = 16,
        layer0Graph = Some(PipelineQueries.knnGraphFor(s, dir, 8)))
    val layers = built.zipWithIndex.map { case (l, i) =>
      if (i == built.length - 1) l else Hnsw.Layer(l.nodes, graft.CacheScope.track(l.graph.cache())) }
    val ids = nodes.filter(col("vec_id") >= 100 && col("vec_id") < 110).select("vec_id")
    val probes = nodes.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val survivors = nodes.join(ids, Seq("vec_id"), "left_anti")
    val shrunk = Hnsw.delete(layers, ids, k = 8)
    val got = Hnsw.search(probes, shrunk, k = 10, beam = 64, rounds = 8)
    val exactS = KnnJoin.exact(probes, survivors, 10)
    val m0 = IvfSearch.recallAtK(got.select("query_id","vec_id"), exactS, 10, probes)
      .agg(avg("recall")).head().getDouble(0)
    println(f"RECALL shrunk top-k repair -> $m0%.3f")
    CacheScope.clear()
    spark.stop()
  }
}
