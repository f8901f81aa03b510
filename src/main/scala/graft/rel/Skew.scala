package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] Salted equi-join for skewed keys. A shuffled join hashes
  * rows to tasks BY KEY, so one hot key (a null-ish default id, a
  * power-law user) lands an entire key's rows — at corpus scale, tens of
  * gigabytes — on a single task. AQE's skew-join handles the common cases
  * at runtime; salting is the explicit, planner-independent form for when
  * the skew is known and extreme: split the hot side's keys into `factor`
  * sub-keys with a salt, replicate the other side once per salt value, and
  * the hot key's rows spread over `factor` tasks. The cost is deliberate —
  * `factor`× duplication of the replicated side's shuffle — so it only
  * pays when the replicated side is much smaller than the hot key's
  * backlog (yet too large or too dynamic to broadcast outright).
  */
object Skew {

  /** Inner equi-join `left ⨝ right ON key`, with `left`'s rows salted
    * across `factor` sub-keys and `right` replicated `factor` times. Join
    * multiplicity is unchanged: each left row carries exactly ONE salt
    * value, and each right row exists exactly once per salt value, so
    * every matching (l, r) pair meets exactly once. The salt is derived
    * from the left row's full content — deterministic (reruns produce the
    * identical spread), no RNG in the plan. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "inputs must not already carry a _salt column")
    val salted = left.withColumn(
      "_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(factor.toLong)))
    val replicated = right.withColumn(
      "_salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1L))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
