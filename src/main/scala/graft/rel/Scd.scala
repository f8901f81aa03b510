package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) change capture: collapse a keyed,
  * timestamp-ordered event stream into versioned dimension rows with
  * half-open validity windows `[valid_from, valid_to)` — the MERGE/CDC
  * primitive of a warehouse ingest pipeline, expressed as two window
  * passes over the same key partitioning.
  *
  * Scale shape: ONE shuffle on the dimension key; both windows (the
  * change-detection lag and the validity lead) reuse that partitioning, so
  * Catalyst plans a single Exchange followed by two in-partition sorts —
  * no per-version join, no driver loop. At 100 TB the key cardinality
  * bounds partition skew, and a hot key degrades to one partition's sort,
  * not a cross-partition problem.
  *
  * Determinism: rows are ordered by (ts, tie) within the key, so equal
  * timestamps resolve stably; the first row of every key always opens
  * version 1 (lag NULL ≠ any attribute).
  */
object Scd {

  /** Versioned history of `attrCol` per `keyCol`, one row per change.
    * Output: key, version (1-based int), attr, valid_from, valid_to
    * (NULL = open), is_current. */
  def scd2(events: DataFrame, keyCol: String, tsCol: String, tieCol: String, attrCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // `lag` is NULL both on the key's first row AND when the previous
    // attribute was genuinely NULL, so NULL-safe inequality alone can't
    // tell "open version 1" from "NULL attr repeated". The first row is
    // identified positionally (row_number, same window — no extra
    // shuffle); every later row opens a version iff the attribute is
    // DISTINCT from its predecessor (NULL-safe, so NULL→NULL does not).
    val changes = events
      .withColumn("_prev", lag(col(attrCol), 1).over(byKey))
      .withColumn("_rn", row_number().over(byKey))
      .filter(col("_rn") === 1 || !(col("_prev") <=> col(attrCol)))
    changes
      .withColumn("version", row_number().over(byKey).cast("int"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .select(
        col(keyCol),
        col("version"),
        col(attrCol),
        col(tsCol).as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
