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
}
