package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("rrf: hand-computed fusion, single-list docs contribute one term, fused order flips on list agreement") {
    // kw: 1 > 2 > 3 ; vec: 3 > 4. Doc 3 appears in both lists and must
    // outrank doc 1 (kw winner) because 1/63 + 1/61 > 1/61.
    val kw = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val vec = Seq((3L, 1), (4L, 2)).toDF("doc_id", "rank")
    val res = Hybrid.rrf(kw, vec, k0 = 60)
    val scores = res.select("doc_id", "rrf").as[(Long, Double)].collect().toMap
    assert(scores.keySet == Set(1L, 2L, 3L, 4L))
    // exact IEEE arithmetic — no tolerance needed
    assert(scores(1L) == 1.0 / 61)
    assert(scores(2L) == 1.0 / 62)
    assert(scores(3L) == 1.0 / 63 + 1.0 / 61)
    assert(scores(4L) == 1.0 / 62)
    val order = res.orderBy(col("rrf").desc, col("doc_id")).select("doc_id").as[Long].collect().toSeq
    assert(order == Seq(3L, 1L, 2L, 4L), s"fused order was $order")
    // absent-list ranks surface as nulls for the caller to shape
    val d3 = res.filter(col("doc_id") === 3).select("kw_rank", "vec_rank").head()
    assert(d3.getInt(0) == 3 && d3.getInt(1) == 1)
    assert(res.filter(col("doc_id") === 1).select("vec_rank").head().isNullAt(0))
  }

  test("rrf keeps every doc from either list exactly once") {
    val kw = spark.range(50).select(col("id").as("doc_id"), (col("id") + 1).cast("int").as("rank"))
    val vec = spark.range(25, 75).select(col("id").as("doc_id"), (col("id") - 24).cast("int").as("rank"))
    val res = Hybrid.rrf(kw, vec)
    assert(res.count() == 75)
    assert(res.select("doc_id").distinct().count() == 75)
    // overlap docs carry both ranks; flank docs carry exactly one
    assert(res.filter(col("kw_rank").isNotNull && col("vec_rank").isNotNull).count() == 25)
  }
}
