package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every true match survives the bloom pre-filter at any fpp") {
    val facts = (0L until 2000L).map(i => (i, i * 10)).toDF("k", "payload")
    val dims  = (0L until 2000L by 7).map(i => (i, s"d$i")).toDF("dk", "attr")
    for (fpp <- Seq(0.5, 0.05, 0.01)) {
      val pruned = BloomJoin.bloomSemiFilter(facts, "k", dims, "dk", expectedItems = 1000, fpp = fpp)
      val joined = pruned.join(dims, col("k") === col("dk")).select("k").as[Long].collect().toSet
      assert(joined == (0L until 2000L by 7).toSet, s"fpp=$fpp lost matches")
    }
  }

  test("pruning is effective: non-matching facts mostly drop before the join") {
    val facts = (0L until 20000L).toDF("k")
    val dims  = (100000L until 100100L).toDF("dk") // fully disjoint keys
    val survivors = BloomJoin
      .bloomSemiFilter(facts, "k", dims, "dk", expectedItems = 100, fpp = 0.01)
      .count()
    // at 1% fpp, ~200 of the 20k non-matching rows may survive; allow 5×
    assert(survivors <= 1000, s"bloom pruned too little: $survivors of 20000 survived")
  }

  test("join result is fpp-invariant (false positives removed by the join)") {
    val facts = (0L until 5000L).map(i => (i % 97, i)).toDF("k", "v")
    val dims  = (0L until 97L by 3).toDF("dk")
    def agg(fpp: Double) = BloomJoin
      .bloomSemiFilter(facts, "k", dims, "dk", expectedItems = 64, fpp = fpp)
      .join(dims, col("k") === col("dk"))
      .agg(count(lit(1)), sum("v")).as[(Long, Long)].head()
    assert(agg(0.3) == agg(0.001))
  }

  test("withBloomSemiFilter: same filtering inside the scope; broadcast destroyed after") {
    val facts = (0L until 2000L).map(i => (i % 97, i)).toDF("k", "v")
    val dims  = (0L until 97L by 3).toDF("dk")
    val open = BloomJoin
      .bloomSemiFilter(facts, "k", dims, "dk", expectedItems = 64, fpp = 0.01)
      .join(dims, col("k") === col("dk"))
      .agg(count(lit(1)), sum("v")).as[(Long, Long)].head()
    val scoped = BloomJoin.withBloomSemiFilter(facts, "k", dims, "dk", expectedItems = 64, fpp = 0.01) {
      filtered =>
        // body must materialize — the broadcast dies when it returns
        filtered.join(dims, col("k") === col("dk"))
          .agg(count(lit(1)), sum("v")).as[(Long, Long)].head()
    }
    assert(scoped == open)
  }
}
