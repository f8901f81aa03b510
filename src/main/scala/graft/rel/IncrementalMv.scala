package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for mergeable aggregates:
  * keep the view as PARTIAL states (count/sum/min/max — each a commutative
  * monoid), fold new data into its own partial, and merge states instead
  * of recomputing the base. At 100 TB the nightly delta is the only data
  * that moves; the standing view is a groups-sized table re-aggregated
  * with it (groups ≪ rows). AVG is derived at read time from (sum, count)
  * — never stored, since it doesn't merge.
  *
  * This is the classic self-maintainable-view shape (distributive
  * aggregates in the sense of Gray et al., Data Cube, ICDE 1996);
  * Spark's own partial aggregation does exactly this within one query —
  * the operator extends it ACROSS queries/days.
  */
object IncrementalMv {

  /** Partial (mergeable) state of the daily per-type event view. */
  def partials(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum("value").as("sum_v"),
        min("value").as("min_v"),
        max("value").as("max_v"))

  /** Merge partial states into a partial state (closed under merging —
    * what a continuously-maintained view folds on). */
  def mergePartials(parts: DataFrame*): DataFrame =
    parts
      .reduce(_ unionByName _)
      .groupBy("day", "event_type")
      .agg(
        sum("n").as("n"),
        sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"),
        max("max_v").as("max_v"))

  /** Merge any number of partial states into the final view. */
  def merge(parts: DataFrame*): DataFrame =
    mergePartials(parts: _*)
      .select(
        col("day"), col("event_type"),
        col("n").as("n_events"), col("sum_v"), col("min_v"), col("max_v"))
}
