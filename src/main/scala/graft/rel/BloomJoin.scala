package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: build a Bloom filter over the (small)
  * dimension side's join keys, broadcast it, and drop fact rows that
  * cannot match BEFORE they reach the join's shuffle. False positives cost
  * only wasted shuffle bytes — the join itself removes them — so the
  * result is EXACTLY the plain join at any fpp, which is what the oracle
  * hash proves.
  *
  * This is the manual form of the runtime row-level filtering Spark's
  * optimizer injects (`spark.sql.optimizer.runtime.bloomFilter.enabled`,
  * SPARK-32268); having it as an operator lets a pipeline pre-filter a
  * 100 TB fact scan against a selective dim predicate even when the
  * planner declines (e.g. the dim is the output of an arbitrary subquery
  * or arrives from another system). At scale the filter is a few MB
  * (expectedItems·~10 bits at 1% fpp) broadcast once, and the fact
  * shuffle shrinks by the dim's key selectivity.
  */
object BloomJoin {

  /** Rows of `facts` whose `factKey` might be present in `dims.dimKey`.
    * The Bloom build is one aggregation over the dim side (driver holds
    * only the filter bits, never the keys). */
  def bloomSemiFilter(
      facts: DataFrame,
      factKey: String,
      dims: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = dims.stat.bloomFilter(dimKey, math.max(expectedItems, 1L), fpp)
    val bc = facts.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bc.value.mightContain(k))
    facts.filter(might(col(factKey)))
  }
}
