package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity / key-quality audit — the pre-flight a pipeline
  * runs before training on a joined corpus: orphaned foreign keys
  * (child rows whose parent vanished — partial loads, late deletes),
  * duplicated primary keys (double loads), and null keys. Each check is
  * one declarative plan: orphans are a LEFT ANTI join on the parent's
  * pruned key column (the parent table never ships more than its key;
  * AQE broadcasts it when small, shuffles only the key projection when
  * not), duplicate keys are a count-filtered aggregate, null keys a
  * predicate count. Results come back as a tiny (check, n_violations)
  * frame — metadata-sized at any corpus scale.
  */
object DataQuality {

  /** Child rows whose NON-NULL `childKey` has no match in
    * `parent.parentKey`. NULL keys are excluded — they are a different
    * defect (a null-key check's business, and `NOT IN` semantics agree:
    * a NULL never counts as an orphan), so the two checks never
    * double-count one row. */
  def orphans(child: DataFrame, childKey: String, parent: DataFrame, parentKey: String): DataFrame =
    child
      .filter(col(childKey).isNotNull)
      .join(
        parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey),
        "left_anti")

  /** Key values carried by more than one row. */
  def duplicateKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows")).filter(col("n_rows") > 1)

  /** One row per named check: (check_name, n_violations). */
  def auditCounts(checks: (String, DataFrame)*): DataFrame =
    checks
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_violations")).select(lit(name).as("check_name"), col("n_violations"))
      }
      .reduce(_ unionByName _)
}
