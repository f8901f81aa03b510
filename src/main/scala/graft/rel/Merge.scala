package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [engine-added] Batch MERGE / upsert: apply a keyed changelog of
  * inserts, updates, and deletes to a snapshot — the warehouse ingest
  * primitive (MERGE INTO), complementing [[Scd]]'s history capture with
  * the "current state" materialization.
  *
  * Semantics: per key, the changelog's LATEST operation (by `ordCol`,
  * ties broken by an explicit op rank U > D > I — an update wins over a
  * same-ord delete, and a delete wins over a same-ord insert; one
  * documented tie rule, encoded as a CASE rank rather than lexicographic
  * op order, which would silently put I above D) wins. `U`/`I` upsert
  * the payload columns; `D` removes the key. Keys untouched by the
  * changelog pass through unchanged.
  *
  * Scale shape: the snapshot is the 100 TB side and its payload rows are
  * never shuffled — the changelog first collapses to one latest-op row
  * per key (a shuffle of the changelog only), then meets the snapshot
  * through two joins the optimizer can broadcast while the collapsed
  * changelog fits (an increment normally does) and AQE degrades to
  * shuffle joins when it genuinely doesn't:
  *   1. a LEFT join snapshot→changes resolves surviving snapshot keys
  *      (absent → passthrough, U/I → replacement payload, D → dropped);
  *   2. a LEFT ANTI join changes→snapshot yields the genuinely new keys.
  *      (Spark broadcasts only the RIGHT side of a left-anti hash join,
  *      so past the broadcast regime this leg shuffles the snapshot's
  *      one-column key projection — key bytes, not payload.)
  * The union of the two legs is the merged table. A naive
  * union-then-latest-wins window would instead shuffle snapshot+changelog
  * payloads on the key — correct, but it moves the mountain to admit a
  * molehill.
  */
object Merge {

  /** The changelog's FINAL change per key — THE collapse rule every
    * changelog consumer shares ([[applyChangelog]] here, the HNSW CDC
    * path in [[graft.streaming.StreamingOps.hnswApplyChangelog]]), so
    * the tie-break semantics live exactly once. Shuffles only the
    * changelog. Equal-ord ties break on the explicit U > D > I rank
    * (NOT opCol's string order, which would rank 'U' > 'I' > 'D'); the
    * raw op string is the LAST tiebreak: any op code outside {U, D, I}
    * falls into rank 0 with 'I', and without a total order row_number
    * would pick whichever row the shuffle surfaced first —
    * nondeterministic output on malformed input. Returns `changes`'
    * own columns, one row per key. */
  def latestChangePerKey(
      changes: DataFrame,
      keyCol: String,
      ordCol: String,
      opCol: String): DataFrame = {
    val opRank =
      when(col(opCol) === "U", 2).when(col(opCol) === "D", 1).otherwise(0)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(ordCol).desc, opRank.desc, col(opCol).desc)
    changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** @param snapshot   current table state
    * @param changes    changelog with `keyCol`, `ordCol`, `opCol`
    *                   ('I' | 'U' | 'D') and the snapshot's payload
    *                   columns (payload of 'D' rows is ignored)
    * @param keyCol     merge key
    * @param ordCol     changelog ordering (e.g. a change sequence number)
    * @param opCol      operation column
    * @return the merged snapshot, same schema as `snapshot`
    */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      ordCol: String,
      opCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == keyCol).toSeq
    val latest = latestChangePerKey(changes, keyCol, ordCol, opCol)
      .select(keyCol, (opCol +: payload): _*)
      .withColumnRenamed(opCol, "_op")

    // explicit match marker: a changelog row may carry a NULL op (rank-0
    // in latestChangePerKey's tie rule — it classifies with 'I'), so
    // "_op is null" cannot double as "no change for this key"
    val latestRe = latest.select(
      col(keyCol) +: col("_op") +: lit(true).as("_matched") +:
        payload.map(c => col(c).as(s"_c_$c")): _*)

    // leg 1: snapshot keys — passthrough / replace / drop. Null-safe op
    // comparison: a matched row whose op is anything but 'D' — null and
    // unknown codes included — REPLACES the payload, the same upsert the
    // rank-0 bucket implies.
    val existing = snapshot
      .join(latestRe, Seq(keyCol), "left")
      .filter(!coalesce(col("_matched"), lit(false)) || !(col("_op") <=> "D"))
      .select(
        col(keyCol) +: payload.map(c =>
          when(coalesce(col("_matched"), lit(false)), col(s"_c_$c")).otherwise(col(c)).as(c)): _*)

    // leg 2: changelog keys the snapshot has never seen, surviving as I/U.
    // Null-safe not-equal: any op outside {U, D, I} — null included —
    // ranks with 'I' in latestChangePerKey's tie rule, so it must UPSERT
    // here too (a bare =!= would null-filter the row and silently drop a
    // malformed-op new key, diverging from leg 1, which upserts a
    // malformed op on an existing key).
    val fresh = latest
      .filter(!(col("_op") <=> "D"))
      .join(snapshot.select(keyCol), Seq(keyCol), "left_anti")
      .select(col(keyCol) +: payload.map(col): _*)

    existing.unionByName(fresh)
  }
}
