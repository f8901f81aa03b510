package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 1000L).toDF("doc_id")

  test("positions are a permutation of 0..n-1 and match the naive global rank") {
    val out = EpochShuffle.shuffle(docs, "doc_id", seed = 42L, shards = 7)
    val naive = docs
      .withColumn("h", EpochShuffle.portableHash(col("doc_id"), 42L))
      .withColumn("position",
        row_number().over(Window.orderBy(col("h"), col("doc_id"))).cast("long") - 1L)
      .select("doc_id", "position")
    val diff = out.select("doc_id", "position")
      .exceptAll(naive)
    assert(diff.isEmpty, s"two-level rank must equal the naive window rank")
    assert(out.count() == 1000 && out.select("position").distinct().count() == 1000)
  }

  test("different seeds give different permutations; same seed is reproducible") {
    val a = EpochShuffle.shuffle(docs, "doc_id", 1L, 4).select("doc_id", "position")
    val b = EpochShuffle.shuffle(docs, "doc_id", 2L, 4).select("doc_id", "position")
    val a2 = EpochShuffle.shuffle(docs, "doc_id", 1L, 4).select("doc_id", "position")
    assert(a.exceptAll(a2).isEmpty, "same seed must reproduce the permutation")
    assert(a.exceptAll(b).count() > 900, "different seeds must scramble most positions")
  }

  test("shards are contiguous rank ranges balanced to within one row") {
    val out = EpochShuffle.shuffle(docs, "doc_id", 7L, shards = 7)
    val sizes = out.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0L until 7L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1, s"imbalanced: $sizes")
    // contiguity: each shard's rank range must not overlap the next's
    val bounds = out.groupBy("shard")
      .agg(min("position").as("lo"), max("position").as("hi"))
      .orderBy("shard").collect()
    bounds.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) + 1 == b.getLong(1), s"gap/overlap: $a → $b")
      case _ =>
    }
  }

  test("plan shape: one shuffle (the range partition); no single-task global window") {
    val out = EpochShuffle.shuffle(docs, "doc_id", 3L, 4)
    out.collect()
    val s = out.queryExecution.executedPlan.toString
    assert(!s.contains("Window"), s"must not fall back to a global window:\n$s")
  }
}
