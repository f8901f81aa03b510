package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [engine-added] As-of join — attach to each left row the single right row
  * whose time is nearest at-or-before (backward) or at-or-after (forward)
  * the left row's time, per join key. The operator Spark lacks natively
  * (pandas `merge_asof` / DuckDB `ASOF JOIN` / kdb `aj`), re-expressed in
  * Spark's execution model rather than as a theta-join:
  *
  * A naive formulation — `left JOIN right ON key AND rt <= lt` then
  * keep-latest — multiplies each left row by EVERY earlier right row before
  * pruning (O(|L|·|R|) per key: a skew bomb at corpus scale). Instead both
  * sides are union-tagged and sorted once per key, and a running
  * `last(payload, ignoreNulls)` window carries the most recent right
  * payload onto each left row: ONE shuffle of |L|+|R| rows on the join key,
  * zero row multiplication, no broadcast requirement on either side. At
  * 1000-executor scale the cost is exactly one repartition+sort of the
  * combined stream — the same shape as a sort-merge join, minus the
  * multiplicity.
  *
  * Ties (several right rows sharing one (key, time)): backward keeps the
  * greatest `tieBreak`, forward the least — deterministic, so results are
  * hash-stable for the driver's oracle compare.
  */
object AsOfJoin {

  /** Most-recent-at-or-before match (inclusive): for each left row, the
    * right payload with the greatest `rightTime <= leftTime`, else nulls.
    *
    * @param payload   right-side columns to carry onto the left rows
    * @param tieBreak  right-side column ordering equal-time rows (greatest wins)
    * @param tolerance optional maximum `leftTime - rightTime` as a Spark
    *                  interval column (e.g. `expr("INTERVAL 7 DAYS")`);
    *                  matches older than it are nulled, as in pandas
    *                  `merge_asof(tolerance=...)`
    */
  def backward(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      tieBreak: String,
      tolerance: Option[Column] = None): DataFrame =
    joined(left, leftKey, leftTime, right, rightKey, rightTime, payload, tieBreak, tolerance, forward = false)

  /** Earliest-at-or-after match (inclusive): least `rightTime >= leftTime`;
    * equal-time ties keep the least `tieBreak`. `tolerance` bounds
    * `rightTime - leftTime`. */
  def forward(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      tieBreak: String,
      tolerance: Option[Column] = None): DataFrame =
    joined(left, leftKey, leftTime, right, rightKey, rightTime, payload, tieBreak, tolerance, forward = true)

  private def joined(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      tieBreak: String,
      tolerance: Option[Column],
      forward: Boolean): DataFrame = {
    val payloadCols = (payload :+ rightTime).distinct
    require(payloadCols.intersect(left.columns.toSeq).isEmpty,
      s"right payload columns ${payloadCols.mkString(",")} must not collide with left columns " +
        "(the output carries both, unqualified)")
    // Right rows carry the payload struct; left rows carry the whole left
    // row — after the window pass the left rows are peeled back out intact.
    // Null-time right rows are dropped (pandas merge_asof semantics):
    // ascending NULLS FIRST would otherwise sort them before every real
    // row, where the running last() hands their payload to left rows that
    // precede the first real right row.
    val cleanRight = right.filter(col(rightTime).isNotNull)
    val taggedRight = cleanRight.select(
      col(rightKey).as("_k"),
      col(rightTime).as("_t"),
      lit(0).as("_tag"),
      col(tieBreak).as("_tb"),
      struct(payloadCols.map(col): _*).as("_p"),
      lit(null).cast(structType(left)).as("_l"))
    val taggedLeft = left.select(
      col(leftKey).as("_k"),
      col(leftTime).as("_t"),
      lit(1).as("_tag"),
      lit(null).cast(taggedRight.schema("_tb").dataType).as("_tb"),
      lit(null).cast(taggedRight.schema("_p").dataType).as("_p"),
      struct(left.columns.map(col): _*).as("_l"))

    // Backward: scan times ascending, right-before-left at equal time (so
    // an equal-time right row IS visible to the left row — inclusive), and
    // ascending tie-break so the running last() retains the greatest.
    // Forward is the mirror image: descending scan, descending tie-break
    // (last() retains the least).
    val ordering =
      if (forward) Seq(col("_t").desc, col("_tag").asc, col("_tb").desc)
      else Seq(col("_t").asc, col("_tag").asc, col("_tb").asc)
    val w = Window.partitionBy("_k").orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedRight.unionByName(taggedLeft)
      .withColumn("_match", last("_p", ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    val withTol = tolerance match {
      case Some(tol) =>
        val lag = if (forward) col("_match")(rightTime) - col("_t") else col("_t") - col("_match")(rightTime)
        matched.withColumn("_match", when(lag <= tol, col("_match")))
      case None => matched
    }
    val out = left.columns.map(c => col("_l")(c).as(c)) ++
      payloadCols.map(c => col("_match")(c).as(c))
    withTol.select(out: _*)
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
