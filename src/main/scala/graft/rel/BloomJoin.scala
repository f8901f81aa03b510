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
    *
    * Contract notes:
    *  - EAGER: the Bloom build runs one aggregation job over the dim side
    *    AT CALL TIME (the filter must exist before the fact plan can be
    *    built — same as any runtime filter). Build once and reuse the
    *    returned frame; don't call per micro-batch.
    *  - Keys must be integral (the bloom hashes longs); enforced here
    *    rather than failing inside the dim aggregation.
    *  - NULL fact keys are dropped: a NULL can never equi-join, so a
    *    pre-JOIN filter discarding them is semantics-preserving — but use
    *    this only ahead of an inner/semi join, not as a general sieve.
    *  - The driver holds only the filter bits, never the dim keys. */
  def bloomSemiFilter(
      facts: DataFrame,
      factKey: String,
      dims: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame =
    filteredWithBroadcast(facts, factKey, dims, dimKey, expectedItems, fpp)._1

  /** [[bloomSemiFilter]] plus ownership of the broadcast: `body` receives
    * the filtered frame, and the broadcast Bloom bits are destroyed when
    * `body` returns — the lifecycle a long-lived pipeline needs, since
    * each `bloomSemiFilter` call pins its (MB-scale at 100 TB dims)
    * broadcast on driver and executors until the frame is GC'd. `body`
    * must materialize anything that outlives the scope (the same contract
    * as [[graft.CacheScope.scoped]]); the plain [[bloomSemiFilter]] leaves
    * cleanup to the caller for frames with open-ended lifetimes. */
  def withBloomSemiFilter[T](
      facts: DataFrame,
      factKey: String,
      dims: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01)(body: DataFrame => T): T = {
    val (filtered, bc) = filteredWithBroadcast(facts, factKey, dims, dimKey, expectedItems, fpp)
    try body(filtered)
    finally bc.destroy()
  }

  /** One shared core so the scoped and open-ended entry points cannot
    * drift: builds the Bloom bits, broadcasts them, and returns the
    * filtered frame plus the broadcast handle the caller owns. */
  private def filteredWithBroadcast(
      facts: DataFrame,
      factKey: String,
      dims: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double): (DataFrame, org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]) = {
    val kt = dims.schema(dimKey).dataType
    require(
      kt == org.apache.spark.sql.types.LongType || kt == org.apache.spark.sql.types.IntegerType,
      s"bloomSemiFilter needs an integral key, got $kt for $dimKey")
    val bf = dims.stat.bloomFilter(dimKey, math.max(expectedItems, 1L), fpp)
    val bc = facts.sparkSession.sparkContext.broadcast(bf)
    // A udf, deliberately: Spark's native BloomFilterMightContain
    // expression exists but is not in the public function registry (it is
    // planner-injected only), and a custom Expression here would buy one
    // virtual call per row on a path whose cost is the scan, not the
    // probe. The udf is the one non-codegen hop in this operator; the
    // filter's job is shrinking the downstream SHUFFLE, which it does
    // identically either way.
    val might = udf((k: Long) => bc.value.mightContain(k))
    (facts.filter(might(col(factKey))), bc)
  }
}
